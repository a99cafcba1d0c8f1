package graft.sources

/** Census API source contract (SURVEY §2.1 S1–S4 + HTTP-layer behaviors).
  *
  * Zero-egress environment: the HTTP transport is a pluggable function; what
  * this module owns is everything the reference computes *around* the wire —
  * endpoint routing, parameter/geography-clause construction, key lookup
  * tables, retry/rate-limit policy constants. All pure and unit-testable.
  * (reference `src/api_client.py`, `src/geography.py:20-136`.)
  */
object CensusApi {
  val BaseUrl = "https://api.census.gov/data"
  /** Reference-pinned policy constants (`src/api_client.py:31-51,154`). */
  val RateLimitDelaySec = 0.5
  val RequestTimeoutSec = 30
  val RetryTotal = 3
  val RetryBackoffFactor = 1
  val RetryStatuses: Set[Int] = Set(429, 500, 502, 503, 504)

  /** Minimal HTTP response surface the retry policy needs. */
  final case class HttpResponse(status: Int, body: String)

  /** Non-retryable or retries-exhausted HTTP failure (the reference's
    * `CensusAPIError` raised out of `raise_for_status`,
    * `src/api_client.py:152-165,219-222`). */
  final class CensusApiError(val status: Int, message: String)
      extends RuntimeException(message)

  /** The reference's HTTP policy, EXECUTABLE: wraps a bare transport
    * `(url, params, timeoutSec) => HttpResponse` into a
    * `(url, params) => body` call that
    *
    *  - sleeps the remainder of [[RateLimitDelaySec]] since the previous
    *    logical request before issuing a new one
    *    (`src/api_client.py:212-217` `_apply_rate_limit`);
    *  - retries statuses in [[RetryStatuses]] up to `total` times with
    *    exponential backoff `backoffFactor * 2^retryIndex` seconds —
    *    urllib3 2.x `Retry(total=3, backoff_factor=1, status_forcelist=…)`
    *    semantics (`src/api_client.py:45-51`); the rate-limit clock is set
    *    once per logical request, matching urllib3's internal retries;
    *  - fails fast (no retry) on any other >= 400, mirroring
    *    `raise_for_status`;
    *  - hands [[RequestTimeoutSec]] to the transport
    *    (`src/api_client.py:154` `timeout=30`).
    *
    * `sleepMs`/`nowMs` are injectable so the policy is unit-testable
    * without wall-clock sleeps; production uses the defaults. The returned
    * function serializes requests (the reference's client is one session
    * with one rate-limit clock). */
  def withRetry(transport: (String, Map[String, String], Int) => HttpResponse,
                total: Int = RetryTotal,
                backoffFactor: Double = RetryBackoffFactor.toDouble,
                retryStatuses: Set[Int] = RetryStatuses,
                rateLimitDelaySec: Double = RateLimitDelaySec,
                timeoutSec: Int = RequestTimeoutSec,
                sleepMs: Long => Unit = Thread.sleep,
                nowMs: () => Long = () => System.currentTimeMillis())
      : (String, Map[String, String]) => String = {
    val lock = new Object
    var lastRequestMs = Long.MinValue
    (url, params) => lock.synchronized {
      val delayMs = (rateLimitDelaySec * 1000).toLong
      if (lastRequestMs != Long.MinValue) {
        val elapsed = nowMs() - lastRequestMs
        if (elapsed < delayMs) sleepMs(delayMs - elapsed)
      }
      lastRequestMs = nowMs()
      var retryIndex = 0
      var result: Option[String] = None
      while (result.isEmpty) {
        val resp = transport(url, params, timeoutSec)
        if (resp.status < 400) result = Some(resp.body)
        else if (retryStatuses(resp.status) && retryIndex < total) {
          sleepMs((backoffFactor * (1L << retryIndex) * 1000).toLong)
          retryIndex += 1
        } else throw new CensusApiError(resp.status,
          s"census API request failed with ${resp.status} after $retryIndex " +
            s"retries: $url")
      }
      result.get
    }
  }

  /** State FIPS -> name (reference `src/geography.py:20-34`). */
  val FipsCodes: Map[String, String] = Map(
    "01" -> "Alabama", "02" -> "Alaska", "04" -> "Arizona", "05" -> "Arkansas",
    "06" -> "California", "08" -> "Colorado", "09" -> "Connecticut",
    "10" -> "Delaware", "11" -> "District of Columbia", "12" -> "Florida",
    "13" -> "Georgia", "15" -> "Hawaii", "16" -> "Idaho", "17" -> "Illinois",
    "18" -> "Indiana", "19" -> "Iowa", "20" -> "Kansas", "21" -> "Kentucky",
    "22" -> "Louisiana", "23" -> "Maine", "24" -> "Maryland",
    "25" -> "Massachusetts", "26" -> "Michigan", "27" -> "Minnesota",
    "28" -> "Mississippi", "29" -> "Missouri", "30" -> "Montana",
    "31" -> "Nebraska", "32" -> "Nevada", "33" -> "New Hampshire",
    "34" -> "New Jersey", "35" -> "New Mexico", "36" -> "New York",
    "37" -> "North Carolina", "38" -> "North Dakota", "39" -> "Ohio",
    "40" -> "Oklahoma", "41" -> "Oregon", "42" -> "Pennsylvania",
    "44" -> "Rhode Island", "45" -> "South Carolina", "46" -> "South Dakota",
    "47" -> "Tennessee", "48" -> "Texas", "49" -> "Utah", "50" -> "Vermont",
    "51" -> "Virginia", "53" -> "Washington", "54" -> "West Virginia",
    "55" -> "Wisconsin", "56" -> "Wyoming", "72" -> "Puerto Rico")

  val StateNameToFips: Map[String, String] = FipsCodes.map(_.swap)

  /** Postal abbreviation -> FIPS (reference `src/geography.py:119-131`). */
  val AbbrevToFips: Map[String, String] = Map(
    "AL" -> "01", "AK" -> "02", "AZ" -> "04", "AR" -> "05", "CA" -> "06",
    "CO" -> "08", "CT" -> "09", "DE" -> "10", "DC" -> "11", "FL" -> "12",
    "GA" -> "13", "HI" -> "15", "ID" -> "16", "IL" -> "17", "IN" -> "18",
    "IA" -> "19", "KS" -> "20", "KY" -> "21", "LA" -> "22", "ME" -> "23",
    "MD" -> "24", "MA" -> "25", "MI" -> "26", "MN" -> "27", "MS" -> "28",
    "MO" -> "29", "MT" -> "30", "NE" -> "31", "NV" -> "32", "NH" -> "33",
    "NJ" -> "34", "NM" -> "35", "NY" -> "36", "NC" -> "37", "ND" -> "38",
    "OH" -> "39", "OK" -> "40", "OR" -> "41", "PA" -> "42", "RI" -> "44",
    "SC" -> "45", "SD" -> "46", "TN" -> "47", "TX" -> "48", "UT" -> "49",
    "VT" -> "50", "VA" -> "51", "WA" -> "53", "WV" -> "54", "WI" -> "55",
    "WY" -> "56", "PR" -> "72")

  /** E9 — FIPS-or-name-or-abbrev -> 2-digit FIPS; unknown ->
    * IllegalArgumentException (reference `src/geography.py:99-136`). */
  def normalizeStateKey(s: String): String = {
    val t = s.trim
    if (t.matches("\\d{1,2}")) {
      val p = f"${t.toInt}%02d"
      if (FipsCodes.contains(p)) p
      else throw new IllegalArgumentException(s"unknown state FIPS: $s")
    } else AbbrevToFips.get(t.toUpperCase)
      .orElse(StateNameToFips.get(t.split("\\s+").map(_.capitalize).mkString(" ")))
      .getOrElse(throw new IllegalArgumentException(s"unknown state: $s"))
  }

  /** E9 (county variant) — county key -> 3-digit FIPS. Numeric keys
    * normalize (reference GEOIDs zero-pad county to 3); name lookup needs a
    * per-state county database the reference also lacks — its
    * `get_county_fips` raises NotImplementedError unconditionally
    * (`src/geography.py:138-146`); we keep that contract for names and add
    * the well-defined numeric normalization. */
  def normalizeCountyKey(county: String): String = {
    val t = county.trim
    if (t.matches("\\d{1,3}")) f"${t.toInt}%03d"
    else throw new UnsupportedOperationException(
      s"county FIPS lookup by name ('$county') requires a local FIPS database " +
        "(reference geography.py:138-146 raises NotImplementedError)")
  }

  /** Endpoint routing (S1–S4): product -> URL path. Decennial year is
    * validated ∈ {2000, 2010, 2020} and routed /dec/dhc (2020) vs /dec/sf1
    * (reference `src/api_client.py:53-119`, `src/census_pipeline.py:215-216`). */
  def endpoint(product: String, year: Int): String = product match {
    case "acs5" => s"$BaseUrl/$year/acs/acs5"
    case "acs1" => s"$BaseUrl/$year/acs/acs1"
    case "decennial" =>
      require(Set(2000, 2010, 2020)(year), s"decennial year must be 2000/2010/2020, got $year")
      if (year == 2020) s"$BaseUrl/$year/dec/dhc" else s"$BaseUrl/$year/dec/sf1"
    case "pep" => s"$BaseUrl/$year/pep/population"
    case other => throw new IllegalArgumentException(s"unknown product: $other")
  }

  /** P7 — geography for/in clause construction; unknown geography ->
    * IllegalArgumentException (reference `src/api_client.py:194-210`). This is
    * the reference's only predicate pushdown — in the Spark engine the same
    * role is played by partition pruning on the landed dataset. */
  def geographyClause(geography: String, state: Option[String],
                      county: Option[String]): Map[String, String] =
    geography match {
      case "state" =>
        Map("for" -> state.map(s => s"state:$s").getOrElse("state:*"))
      case "county" =>
        Map("for" -> "county:*") ++ state.map(s => "in" -> s"state:$s")
      case "tract" =>
        val in = (state.map(s => s"state:$s") ++ county.map(c => s"county:$c")).mkString(" ")
        Map("for" -> "tract:*") ++ (if (in.nonEmpty) Some("in" -> in) else None)
      case "block group" =>
        val in = (state.map(s => s"state:$s") ++ county.map(c => s"county:$c")).mkString(" ")
        Map("for" -> "block group:*") ++ (if (in.nonEmpty) Some("in" -> in) else None)
      case other => throw new IllegalArgumentException(s"unknown geography: $other")
    }

  /** Full request params incl. optional API key
    * (reference `src/api_client.py:167-192`). */
  def buildParams(variables: Seq[String], geography: String,
                  state: Option[String] = None, county: Option[String] = None,
                  apiKey: Option[String] = None): Map[String, String] =
    Map("get" -> variables.mkString(",")) ++
      geographyClause(geography, state, county) ++
      apiKey.map("key" -> _)
}
