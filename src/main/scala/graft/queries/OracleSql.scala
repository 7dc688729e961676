package graft.queries

/** Shared DuckDB-SQL fragments for the portable-hash contract. */
private[queries] object OracleSql {

  /** Hex digits [off, off+3] (1-based) of md5 hex string `h` as a 16-bit int, where
    * `off` is any SQL integer expression. The SQL mirror of
    * graft.functions.TokenHash.hash16's digest-byte arithmetic — the single source
    * of the contract used by the SimHash oracles and the multimodal stub-decode
    * oracles.
    */
  def hex16(h: String, off: String): String =
    (0 to 3).map { k =>
      val weight = 1 << (4 * (3 - k))
      s"(strpos('0123456789abcdef', substr($h, ($off) + $k, 1)) - 1) * $weight"
    }.mkString("(", " + ", ")")
}
