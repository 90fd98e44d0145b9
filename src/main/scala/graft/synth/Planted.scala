package graft.synth

/** Deterministic planted fixture rows unioned into the driver's parquet
  * tables by SparkEntry (VERDICT r7 item 1): at the driver's tier the
  * corpus contains no exact-duplicate texts, no doc sharing a 13-gram
  * with the doc_id%97 probe set, and no customer without orders — so
  * `doc_exact_dedup`, `doc_decontaminate` and `q6_antijoin` were green
  * on EMPTY results (0 spark rows = 0 oracle rows), which proves the
  * plumbing, not the operator. These rows are unioned identically on
  * BOTH sides of the oracle compare — the Spark query unions this table,
  * the DuckDB oracle unions a VALUES literal generated FROM THESE SAME
  * CONSTANTS (SparkEntry.plantedDocsValuesSql) — so the fixtures are
  * lockstep by construction and every tier exercises all three
  * operators non-vacuously.
  *
  * Invariants (PlantedSpec pins them):
  *  - ids ≥ 9.6e8, far above any tier's real doc_id range (sf1 tops out
  *    around 5e4) and small enough for DuckDB's INT32 VALUES literals;
  *  - exactly one planted doc_id ≡ 0 (mod 97) — the planted PROBE;
  *  - exact-dup texts have < 13 tokens (no grams → they cannot perturb
  *    decontamination), contamination texts are pairwise distinct (no
  *    new exact-dup groups), and all tokens are zz-prefixed nonsense
  *    (no 13-gram collision with any real-word corpus is possible since
  *    a gram needs 13 consecutive shared tokens);
  *  - texts contain no quotes/backslashes (safe as SQL string literals).
  */
object Planted {

  /** Two exact-duplicate groups (sizes 3 and 2) under distinct doc_ids —
    * the sf1 planted-dup shape, now present at every tier.
    */
  val exactDups: Seq[(Long, String)] = Seq(
    (960000001L, "planted exact duplicate text zzdupalpha"),
    (960000002L, "planted exact duplicate text zzdupalpha"),
    (960000003L, "planted exact duplicate text zzdupalpha"),
    (960000011L, "planted exact duplicate text zzdupbeta"),
    (960000012L, "planted exact duplicate text zzdupbeta"))

  /** The planted probe doc id: ≡ 0 (mod 97), so it joins the
    * doc_decontaminate query's deterministic probe subset.
    */
  val probeId: Long = 970000000L

  private val g: Seq[String] = (1 to 14).map(i => s"zzgram$i")

  /** Probe (14 tokens → 13-grams G1=g1..g13, G2=g2..g14) plus two
    * contaminated docs: one sharing G1 only (n_hits=1), one sharing both
    * (n_hits=2, exercising the countDistinct). The probe itself must NOT
    * be flagged (self-hits excluded).
    */
  val contamination: Seq[(Long, String)] = Seq(
    (probeId, g.mkString(" ")),
    (970000001L, ("zzlead" +: g.take(13)).mkString(" ") + " zztail"),
    (970000002L, (g :+ "zzother").mkString(" ")))

  /** All planted (doc_id, text) rows — the single table both doc_*
    * queries union in.
    */
  val docs: Seq[(Long, String)] = exactDups ++ contamination

  /** Customers with no orders at ANY tier (order keys are positive) —
    * guaranteed q6 anti-join survivors.
    */
  val custkeys: Seq[Long] = Seq(-1L, -2L)

  /** PII fixtures for doc_pii_scrub (same rationale as [[docs]]: the
    * synthetic corpus contains no email addresses or ≥7-digit runs, so
    * the scrubber would be vacuously green at every tier). One
    * email-only row, one numbers-only row, one with both (number
    * counted AFTER the email pass — the address's own digits must not
    * double-count), and one negative control that must pass through
    * byte-identical. NEVER unioned into any other query's input — the
    * [[docs]] invariants (gram-freedom, single mod-97 probe) do not
    * constrain these rows, only the id-range/SQL-literal ones do
    * (PlantedSpec pins both sets).
    */
  val pii: Seq[(Long, String)] = Seq(
    (980000001L, "zzpii reach alice.smith@example.com for access"),
    (980000002L, "zzpii call 5551234567 or 18005551212 today"),
    (980000003L, "zzpii bob_jr+spam@mail.example.org backup 1234567 zztail"),
    (980000004L, "zzpii clean row with no sensitive content"))

  /** Multi-line fixtures for doc_line_dedup (same rationale as [[pii]]:
    * every synthetic corpus text is a SINGLE line, so cross-document
    * duplicate-line scrubbing would only ever fire on whole-doc exact
    * dups). Three docs share a boilerplate header line (one of them also
    * a footer), each keeping a unique payload line, plus one all-unique
    * negative control that must pass through byte-identical. Texts
    * contain real newlines — legal inside both a Spark string and a
    * DuckDB VALUES literal — and each LINE obeys the quote/backslash/
    * spacing safety pins. NEVER unioned into any other query's input.
    */
  val lines: Seq[(Long, String)] = Seq(
    (990000001L, "zzline boilerplate header\nzzline unique alpha one\nzzline boilerplate footer"),
    (990000002L, "zzline boilerplate header\nzzline unique beta two\nzzline boilerplate footer"),
    (990000003L, "zzline unique gamma three\nzzline boilerplate header"),
    (990000004L, "zzline all unique row\nzzline another unique row"))
}
