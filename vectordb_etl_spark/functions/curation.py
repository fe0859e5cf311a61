"""Training-data curation functions — PII redaction and deterministic
sampling (beyond-reference tier; the reference has no curation surface).

Same design stance as functions/cleaning.py: one shared pattern/formula
table renders BOTH the PySpark Column chain (JVM-side, whole-stage codegen)
and the DuckDB oracle SQL, so every operator here is hash-checkable.

**PII redaction** — the pre-training scrub pass: emails, phone numbers
(international + Korean formats), IPv4 addresses, 13–16-digit card-like
runs, and Korean resident-registration-number shapes are replaced with
typed tags (``<EMAIL>``…). Patterns are lookaround-free so Java regex and
RE2 execute them identically; order matters (RRN before generic digit runs
would double-match otherwise — more specific first).

**Deterministic sampling** — ``md5``-bucket thresholding instead of
``rand()``: the same row is always in or out of the sample regardless of
partitioning, retries, or engine (rand()-based sampling is neither
reproducible across runs nor oracle-checkable). This is how a 100 TB
pipeline pins its eval/holdout splits: the split is a pure function of the
row id. Stratified variant applies a per-stratum fraction — the
downsample-overrepresented-domains step of corpus mixing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# PII redaction
# --------------------------------------------------------------------------

# (pattern, replacement) — identical in Java regex and RE2 (no lookaround,
# no backrefs). Order is specificity-first.
PII_STEPS: list[tuple[str, str]] = [
    # email
    (r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # Korean RRN shape: YYMMDD-NNNNNNN
    (r"\b\d{6}-\d{7}\b", "<RRN>"),
    # card-like: 4 groups of 4 digits with separators
    (r"\b\d{4}[ \-]\d{4}[ \-]\d{4}[ \-]\d{4}\b", "<CARD>"),
    # IPv4
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    # phone: international (+82-10-1234-5678) and local (010-1234-5678,
    # 02-123-4567) forms
    (r"\+\d{1,3}[ \-]\d{1,3}[ \-]\d{3,4}[ \-]\d{4}\b", "<PHONE>"),
    (r"\b0\d{1,2}[ \-]\d{3,4}[ \-]\d{4}\b", "<PHONE>"),
]


def redact_pii_col(col: Column | str) -> Column:
    """Chained ``regexp_replace`` over :data:`PII_STEPS` — JVM-side."""
    c = F.col(col) if isinstance(col, str) else col
    for pattern, repl in PII_STEPS:
        c = F.regexp_replace(c, pattern, repl)
    return c


def redact_pii_sql(expr: str) -> str:
    """DuckDB rendering of the same chain (RE2 'g' flag for replace-all,
    matching Spark's regexp_replace semantics)."""
    out = expr
    for pattern, repl in PII_STEPS:
        p = pattern.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{repl}', 'g')"
    return out


def pii_hit_counts_col(col: Column | str) -> Column:
    """Count of PII matches per row (audit metric: how dirty is the
    corpus) — sum of per-pattern regexp_count, one pass per pattern."""
    c = F.col(col) if isinstance(col, str) else col
    total = F.lit(0)
    for pattern, _ in PII_STEPS:
        total = total + F.regexp_count(c, F.lit(pattern))
    return total


def pii_hit_counts_sql(expr: str) -> str:
    parts = []
    for pattern, _ in PII_STEPS:
        p = pattern.replace("'", "''")
        parts.append(f"len(regexp_extract_all({expr}, '{p}'))")
    return " + ".join(parts)


# --------------------------------------------------------------------------
# deterministic sampling
# --------------------------------------------------------------------------

_SAMPLE_BUCKETS = 1_000_000


def sample_bucket_col(id_col: Column | str) -> Column:
    """Stable bucket in [0, 1e6): first 8 md5 hex digits of the stringified
    id, mod 1e6. Engine-portable (md5 and hex parse agree bit-for-bit)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long")
    return h % _SAMPLE_BUCKETS


def sample_bucket_sql(id_expr: str) -> str:
    return (
        f"(('0x' || substring(md5(CAST({id_expr} AS VARCHAR)), 1, 8))::BIGINT "
        f"% {_SAMPLE_BUCKETS})"
    )


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided per row by its id hash — stable
    across runs/partitionings/engines, unlike ``df.sample``."""
    return df.filter(sample_bucket_col(id_col) < int(fraction * _SAMPLE_BUCKETS))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 1.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the downsampling step of corpus
    mixing (e.g. keep 10% of boilerplate-heavy domains, 100% of rare
    languages). Thresholds compile to one CASE chain: no join, no shuffle,
    fully pushdown-eligible."""
    thr: Column = F.lit(int(default_fraction * _SAMPLE_BUCKETS))
    for value, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == value, F.lit(int(frac * _SAMPLE_BUCKETS))
        ).otherwise(thr)
    return df.filter(sample_bucket_col(id_col) < thr)


def stratified_sample_sql(
    table: str,
    id_expr: str,
    strata_expr: str,
    fractions: dict[str, float],
    default_fraction: float = 1.0,
) -> str:
    cases = " ".join(
        f"WHEN {strata_expr} = '{v}' THEN {int(f * _SAMPLE_BUCKETS)}"
        for v, f in sorted(fractions.items())
    )
    thr = f"CASE {cases} ELSE {int(default_fraction * _SAMPLE_BUCKETS)} END"
    return (
        f"SELECT * FROM {table} WHERE {sample_bucket_sql(id_expr)} < {thr}"
    )


def percentile_screen(
    df: DataFrame,
    value_col: str,
    lo_p: float = 0.01,
    hi_p: float = 0.99,
) -> DataFrame:
    """Keep rows whose ``value_col`` lies inside the corpus's
    [``lo_p``, ``hi_p``] exact interpolated percentile band — the standard
    length-outlier screen (truncated docs at the bottom, concatenation
    artifacts at the top) corpus prep applies before training.

    Scale shape: one aggregate computes both thresholds (Spark
    ``percentile`` ≡ DuckDB ``quantile_cont``, both linear interpolation);
    the 1-row bounds frame broadcasts into the filter — no driver collect,
    no second scan beyond the filter pass. Exact per-corpus percentiles
    co-locate the value column once; at extreme scale swap in
    ``percentile_approx`` and accept sketch error (documented trade,
    operators/skew.py)."""
    c = F.col(value_col).cast("double")
    bounds = df.agg(
        F.expr(f"percentile({value_col}, {lo_p})").alias("__lo"),
        F.expr(f"percentile({value_col}, {hi_p})").alias("__hi"),
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .filter((c >= F.col("__lo")) & (c <= F.col("__hi")))
        .drop("__lo", "__hi")
    )


def percentile_screen_sql(
    table: str,
    value_col: str,
    lo_p: float = 0.01,
    hi_p: float = 0.99,
    select: str = "*",
) -> str:
    return (
        f"SELECT {select} FROM {table} WHERE CAST({value_col} AS DOUBLE) >= "
        f"(SELECT quantile_cont({value_col}, {lo_p}) FROM {table}) "
        f"AND CAST({value_col} AS DOUBLE) <= "
        f"(SELECT quantile_cont({value_col}, {hi_p}) FROM {table})"
    )


_WEIGHT_KEY_DENOM = float(1 << 48)


def weighted_priority_col(id_col: Column | str, weight_col: Column | str) -> Column:
    """Efraimidis–Spirakis priority for weighted sampling WITHOUT
    replacement: ``-ln(u)/w`` with u uniform in (0, 1] — the exponential
    race: keeping the k smallest priorities selects items with first-pick
    probability w_i/Σw, exactly the A-Res scheme (Efraimidis & Spirakis
    2006, public algorithm). u derives from 48 md5 bits of the id (exactly
    representable in a double, +1 to exclude zero), so the draw is a pure
    function of the id — stable across runs, partitionings, and engines.
    NULL for non-positive weights: a zero-weight item must never win."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 12), 16, 10).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(_WEIGHT_KEY_DENOM)
    return F.when(w > 0, -F.log(u) / w.cast("double"))


def weighted_priority_sql(id_expr: str, weight_expr: str) -> str:
    return (
        f"CASE WHEN {weight_expr} > 0 THEN "
        f"-ln(CAST(('0x' || substring(md5(CAST({id_expr} AS VARCHAR)), 1, 12))::BIGINT + 1 "
        f"AS DOUBLE) / {_WEIGHT_KEY_DENOM:.1f}) / CAST({weight_expr} AS DOUBLE) "
        f"END"
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    id_col: str = "doc_id",
    weight_col: str = "n_tokens",
    strata_col: str | None = None,
) -> DataFrame:
    """Deterministic weighted sampling without replacement: keep the ``k``
    smallest exponential-race priorities (per stratum when ``strata_col``
    given) — quality-weighted corpus selection where high-weight docs win
    proportionally more often, with zero RNG state.

    Scale shape: stratified selection is one window over the stratum key
    (single hash-partition exchange); global selection plans as
    TakeOrderedAndProject (a size-k heap per partition — no global sort).
    Rows with non-positive weight are excluded by construction."""
    pri = weighted_priority_col(id_col, weight_col)
    keyed = df.withColumn("__pri", pri).filter(F.col("__pri").isNotNull())
    if strata_col is None:
        out = keyed.orderBy(F.asc("__pri"), F.asc(id_col)).limit(k)
    else:
        from pyspark.sql.window import Window

        w = Window.partitionBy(strata_col).orderBy(
            F.asc("__pri"), F.asc(id_col)
        )
        out = (
            keyed.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )
    return out.withColumn("priority", F.round("__pri", 6)).drop("__pri")


def weighted_sample_sql(
    table: str,
    k: int,
    id_expr: str = "doc_id",
    weight_expr: str = "n_tokens",
    strata_expr: str | None = None,
    select: str = "*",
) -> str:
    """Oracle: identical priority arithmetic + rank rule."""
    pri = weighted_priority_sql(id_expr, weight_expr)
    part = f"PARTITION BY {strata_expr} " if strata_expr else ""
    return (
        f"SELECT {select}, round(__pri, 6) AS priority FROM ("
        f"SELECT *, {pri} AS __pri, row_number() OVER ({part}"
        f"ORDER BY {pri}, {id_expr}) AS __rn FROM {table} "
        f"WHERE {pri} IS NOT NULL) WHERE __rn <= {k}"
    )


def mix_fractions(
    df: DataFrame,
    strata_col: str,
    token_col: str,
    targets: dict[str, float],
    total_tokens: int,
) -> dict[str, float]:
    """Token-budget domain mixing: turn a TARGET mixture (stratum → share
    of a token budget) into per-stratum keep fractions, given what each
    stratum actually has. fraction_s = min(1, share_s·budget / available_s)
    — an over-represented domain is downsampled to its share, an
    under-represented one is kept whole (shares are targets, not promises;
    upsampling/repetition is a separate training-loop concern).

    One aggregate job (per-stratum token sums collect to the driver — a
    handful of rows at any corpus size); the returned dict feeds
    :func:`stratified_sample`, whose md5 thresholds compile to a CASE
    chain — the end-to-end mixing pass is one scan + one filter."""
    avail = {
        r[strata_col]: int(r["__tok"] or 0)  # all-NULL stratum sums to NULL
        for r in df.groupBy(strata_col)
        .agg(F.sum(token_col).alias("__tok"))
        .collect()
    }
    out = {}
    for stratum, share in targets.items():
        if stratum not in avail or avail[stratum] <= 0:
            continue
        out[stratum] = min(1.0, (share * total_tokens) / avail[stratum])
    return out


# --------------------------------------------------------------------------
# DSIR — importance weights for data selection (Xie et al. 2023, "Data
# Selection for Language Models via Importance Resampling" — public paper)
# --------------------------------------------------------------------------


def _token_bucket_col(tok: Column, buckets: int) -> Column:
    """Engine-portable hashed-unigram feature: first 6 md5 hex digits of
    the token, mod ``buckets`` (same md5/hex-parse convention as
    :func:`stable_bucket`)."""
    return (
        F.conv(F.substring(F.md5(tok), 1, 6), 16, 10).cast("long")
        % F.lit(buckets)
    )


def _token_bucket_sql(tok_expr: str, buckets: int) -> str:
    return (
        f"(('0x' || substring(md5({tok_expr}), 1, 6))::BIGINT % {buckets})"
    )


def dsir_log_weights(
    df: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 256,
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR importance weights: score each raw document with
    ``log p_target(x) − log p_raw(x)`` under hashed-unigram bag-of-words
    models with add-``alpha`` smoothing — the data-selection signal of Xie
    et al. (sample raw docs with probability ∝ exp(weight) to shift the
    corpus toward the ``target`` domain). Returns
    ``(id, n_tokens, log_weight)`` with the weight rounded to 6 dp; docs
    with zero tokens keep a NULL weight.

    Model: p[b] = (count[b] + alpha) / (total + alpha·buckets) over hashed
    token buckets, fitted once on ``target`` and once on ``df`` itself.

    Scale shape: both models are ≤``buckets`` rows — they join BROADCAST
    onto the token stream, so the only exchanges are the two tiny
    bucket-count aggregations and the final per-doc sum; nothing shuffles
    on the token key and nothing touches the driver. At 100 TB the token
    explode dominates and is embarrassingly parallel.
    """
    def toks(frame: DataFrame, *keep: str) -> DataFrame:
        arr = F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
        )
        return frame.select(*keep, F.explode(arr).alias("__tok")).select(
            *keep, _token_bucket_col(F.col("__tok"), buckets).alias("__b")
        )

    raw_toks = toks(df.select(F.col(id_col).alias("id"), text_col), "id")
    t_counts = toks(target).groupBy("__b").agg(F.count("*").alias("__ct"))
    r_counts = raw_toks.groupBy("__b").agg(F.count("*").alias("__cr"))
    t_total = t_counts.agg(F.sum("__ct").alias("__tt"))
    r_total = r_counts.agg(F.sum("__cr").alias("__tr"))

    scored = (
        raw_toks.join(F.broadcast(t_counts), "__b", "left")
        .join(F.broadcast(r_counts), "__b")
        .crossJoin(F.broadcast(t_total))
        .crossJoin(F.broadcast(r_total))
        .withColumn(
            "__lw",
            F.log(
                (F.coalesce("__ct", F.lit(0)) + F.lit(alpha))
                / (F.col("__tt") + F.lit(alpha * buckets))
            )
            - F.log(
                (F.col("__cr") + F.lit(alpha))
                / (F.col("__tr") + F.lit(alpha * buckets))
            ),
        )
        .groupBy("id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.sum("__lw"), 6).alias("log_weight"),
        )
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            "log_weight",
        )
    )


def dsir_log_weights_sql(
    table: str = "documents",
    target_sql: str = "SELECT text FROM documents WHERE source = 'src0'",
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 256,
    alpha: float = 1.0,
) -> str:
    """Oracle: identical tokenization, hashing, smoothing, and rounding."""
    b = _token_bucket_sql("tok", buckets)
    return f"""
WITH raw_toks AS MATERIALIZED (
  SELECT id, {b} AS bk
  FROM (SELECT {id_col} AS id,
               unnest(list_filter(string_split_regex(lower({text_col}), '\\s+'),
                                  x -> x <> '')) AS tok
        FROM {table})
), tgt_toks AS (
  SELECT {b} AS bk
  FROM (SELECT unnest(list_filter(string_split_regex(lower({text_col}), '\\s+'),
                                  x -> x <> '')) AS tok
        FROM ({target_sql}) tgt)
), ct AS (SELECT bk, count(*) AS n FROM tgt_toks GROUP BY bk),
cr AS (SELECT bk, count(*) AS n FROM raw_toks GROUP BY bk),
tt AS (SELECT sum(n) AS t FROM ct), tr AS (SELECT sum(n) AS t FROM cr),
scored AS (
  SELECT r.id, count(*) AS n_tokens,
         round(sum(
           ln((coalesce(ct.n, 0) + {alpha}) / (tt.t + {alpha} * {buckets}))
           - ln((cr.n + {alpha}) / (tr.t + {alpha} * {buckets}))
         ), 6) AS log_weight
  FROM raw_toks r
  LEFT JOIN ct USING (bk) JOIN cr USING (bk)
  CROSS JOIN tt CROSS JOIN tr
  GROUP BY r.id
)
SELECT d.{id_col}, CAST(coalesce(s.n_tokens, 0) AS BIGINT) AS n_tokens,
       s.log_weight
FROM {table} d LEFT JOIN scored s ON s.id = d.{id_col}
"""


# --------------------------------------------------------------------------
# per-domain document caps (RefinedWeb/C4-style source balancing)
# --------------------------------------------------------------------------


def domain_cap_sample(
    df: DataFrame,
    group_col: str = "source",
    cap: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Cap documents per domain/source at ``cap``, keeping a deterministic
    md5-ordered subset (RefinedWeb-style source balancing: a handful of
    over-represented domains otherwise dominate the mixture). Zero RNG
    state — the keep-set is a pure function of the ids, so reruns and the
    SQL oracle agree bit-for-bit.

    Scale shape: a map-side-combined per-domain count first splits domains
    into under-cap (their rows pass through a broadcast ANTI join — they
    are never shuffled, and at web scale the domain distribution is
    Zipf-tailed, so this is MOST rows) and over-cap (only those rows pay
    the per-domain window sort). The over-cap window partitions by domain;
    a mega-domain lands in one task but sorts only its OWN rows — bounded
    by the largest single domain, not the corpus.

    NULL group keys are capped like any other domain: the split joins run
    on a NULL-coalesced shadow key (plain equi-joins never match NULL, so
    an uncoalesced split would wave every NULL-domain row through the
    anti join uncapped — silently diverging from the window-cap
    semantics, which treat NULL as one partition)."""
    from pyspark.sql.window import Window

    # shadow key: group value as string, NULL -> sentinel. Injective for a
    # single-typed column, and lets the over/under split use plain
    # broadcast equi-joins while still capping the NULL domain.
    sentinel = "\x00__null_domain__\x00"
    gk = F.coalesce(F.col(group_col).cast("string"), F.lit(sentinel))
    dfk = df.withColumn("__gk", gk)
    counts = dfk.groupBy("__gk").agg(F.count("*").alias("__n"))
    over = counts.filter(F.col("__n") > cap).select("__gk")
    under_rows = dfk.join(F.broadcast(over), "__gk", "left_anti").drop("__gk")
    w = Window.partitionBy("__gk").orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    over_rows = (
        dfk.join(F.broadcast(over), "__gk", "left_semi")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__gk", "__rn")
    )
    return under_rows.unionByName(over_rows)


def domain_cap_sample_sql(
    table: str = "documents",
    group_col: str = "source",
    cap: int = 10,
    id_col: str = "doc_id",
    select_cols: str = "doc_id, source",
) -> str:
    """Oracle: the under/over split is a pure optimization — the result
    equals the plain per-domain window cap, stated directly."""
    return (
        f"SELECT {select_cols} FROM ("
        f"  SELECT *, row_number() OVER ("
        f"    PARTITION BY {group_col} "
        f"    ORDER BY md5(CAST({id_col} AS VARCHAR)), {id_col}) AS rn"
        f"  FROM {table}) WHERE rn <= {cap}"
    )


# --------------------------------------------------------------------------
# hashed linear quality classifier — fastText-style SERVING
# --------------------------------------------------------------------------


def classifier_weight_table(
    spark,
    buckets: int = 256,
    seed: int = 101,
) -> DataFrame:
    """Deterministic per-bucket integer micro-weights — the stand-in for a
    TRAINED fastText/logistic quality classifier's weight vector (training
    is out of scope here, as in the reference; a user drops in their
    trained weights as the same ``(bk, w_micro)`` shape). Weight =
    (60-bit md5 int of ``seed|bucket``) mod 1000001 − 500000, i.e. a
    fixed pseudo-random value in [−5e5, 5e5] micro-units — integers, so
    scoring is bit-stable cross-engine."""
    return spark.range(buckets).select(
        F.col("id").cast("int").alias("bk"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("|", F.lit(str(seed)), F.col("id"))), 1, 15
                ),
                16,
                10,
            ).cast("long")
            % F.lit(1000001)
            - F.lit(500000)
        ).alias("w_micro"),
    )


def hashed_classifier_scores(
    df: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 256,
) -> DataFrame:
    """Linear text-classifier SERVING over hashed unigram features — the
    plan shape of every fastText-style quality/toxicity/domain classifier
    applied at corpus scale (CCNet, LLaMA's quality filter): score(doc) =
    mean over token instances of w[bucket(token)].

    Scale shape: tokens explode from one split (no Python), the weight
    vector joins BROADCAST (``buckets`` rows), and the only exchange is
    the per-doc sum — identical cost to counting tokens. Returns
    ``(id, n_tokens, score_micro)`` with the mean as a floored micro-unit
    bigint (pmod identity, sign-correct — weights go negative); NULL for
    token-less docs."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda x: x != F.lit(""),
            )
        ).alias("tok"),
    ).select("id", _token_bucket_col(F.col("tok"), buckets).cast("int").alias("bk"))
    scored = (
        toks.join(F.broadcast(weights), "bk")
        .groupBy("id")
        .agg(F.count("*").alias("n_tokens"), F.sum("w_micro").alias("__s"))
        .select(
            "id",
            "n_tokens",
            F.expr("(__s - pmod(__s, n_tokens)) DIV n_tokens").alias(
                "score_micro"
            ),
        )
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
            F.col("score_micro").cast("bigint").alias("score_micro"),
        )
    )


def hashed_classifier_scores_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 256,
    seed: int = 101,
) -> str:
    """Oracle: identical tokenization, bucket hash, md5-derived weights,
    and floor-mean (mod identity — DuckDB's integer // truncates, see
    operators/rollup.py)."""
    return f"""
WITH w AS MATERIALIZED (
  SELECT CAST(bk AS INT) AS bk,
         (('0x' || substring(md5('{seed}' || '|' || bk), 1, 15))::BIGINT
          % 1000001 - 500000) AS w_micro
  FROM (SELECT unnest(range(0, {buckets})) AS bk)
), toks AS (
  SELECT id, CAST({_token_bucket_sql('tok', buckets)} AS INT) AS bk FROM (
    SELECT {id_col} AS id,
           unnest(list_filter(string_split_regex(lower({text_col}), '\\s+'),
                              x -> x <> '')) AS tok
    FROM {table})
), scored AS (
  SELECT id, count(*) AS n_tokens, sum(w_micro) AS s
  FROM toks JOIN w USING (bk) GROUP BY id
)
SELECT d.{id_col}, CAST(coalesce(sc.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST((sc.s - ((sc.s % sc.n_tokens + sc.n_tokens) % sc.n_tokens))
            // sc.n_tokens AS BIGINT) AS score_micro
FROM {table} d LEFT JOIN scored sc ON sc.id = d.{id_col}
"""


# --------------------------------------------------------------------------
# sample-based quantiles — order statistics at scale
# --------------------------------------------------------------------------


def sample_quantiles(
    df: DataFrame,
    id_col: str,
    value_col: str,
    probs: list[float],
    fraction: float = 0.01,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Quantiles from a DETERMINISTIC sample — the scale pattern for
    order statistics: exact percentiles need a full sort of the column,
    but percentiles of an md5-bucket sample (``deterministic_sample``)
    cost one small aggregation and carry the standard sampling error
    (±O(1/√(f·n)) in rank). Because the sample membership is a pure
    function of the id hash — not ``rand()`` — the result is identical
    across runs, partitionings, AND engines, and Spark's ``percentile``
    interpolation (lower + (higher−lower)·frac) is bit-identical to
    DuckDB's ``quantile_cont`` (verified over arbitrary probs), so even
    the interpolated DOUBLE output hash-matches the SQL twin.

    Returns ``(group..., p_ppm, q)`` — one row per prob, prob as an
    integer ppm key."""
    gs = group_cols or []
    samp = deterministic_sample(df, id_col, fraction)
    rows = []
    for p in probs:
        agg = samp.groupBy(*gs).agg(
            F.lit(int(round(p * 1_000_000))).cast("bigint").alias("p_ppm"),
            F.expr(f"percentile({value_col}, CAST({p!r} AS DOUBLE))").alias(
                "q"
            ),
        )
        rows.append(agg)
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def sample_quantiles_sql(
    source_sql: str,
    id_col: str,
    value_col: str,
    probs: list[float],
    fraction: float = 0.01,
    group_cols: list[str] | None = None,
) -> str:
    """DuckDB twin of :func:`sample_quantiles`."""
    gs = group_cols or []
    gsel = "".join(f"{g}, " for g in gs)
    gby = (" GROUP BY " + ", ".join(gs)) if gs else ""
    thresh = int(fraction * _SAMPLE_BUCKETS)
    samp = (
        f"SELECT * FROM ({source_sql}) "
        f"WHERE {sample_bucket_sql(id_col)} < {thresh}"
    )
    parts = [
        f"SELECT {gsel}CAST({int(round(p * 1_000_000))} AS BIGINT) AS p_ppm, "
        f"quantile_cont({value_col}, CAST({p!r} AS DOUBLE)) AS q "
        f"FROM samp{gby}"
        for p in probs
    ]
    return (
        f"WITH samp AS MATERIALIZED ({samp}) " + " UNION ALL ".join(parts)
    )


# --------------------------------------------------------------------------
# leakage-safe train/val/test split
# --------------------------------------------------------------------------


def leakage_safe_split(
    df: DataFrame,
    group_col: Column | str,
    splits: list[tuple[str, float]],
) -> DataFrame:
    """Assign every row to a train/val/test split BY DUPLICATE GROUP, not by
    row: the split is a pure md5-bucket function of ``group_col`` (e.g. a
    content fingerprint), so exact/near duplicates — which share the group
    key — can never straddle the train/eval boundary. This is the standard
    leakage guard for pretraining corpora (eval contamination via duplicated
    documents; cf. Lee et al. 2022 "Deduplicating Training Data Makes
    Language Models Better", §6): splitting by row id leaks every duplicated
    document across splits with probability 1 − Σfᵢ².

    ``splits`` is an ordered list of (name, fraction) summing to ~1.0; the
    last split absorbs rounding remainder. Assignment compiles to one CASE
    chain over the md5 bucket — no shuffle, no join, no RNG state; the same
    document lands in the same split on any cluster, any partitioning, any
    engine (the DuckDB twin below is hash-identical).

    Scale: O(n) map-only; at 100 TB this adds one projected column to the
    scan. The group key itself comes from whatever dedup tier is in play
    (md5(text) for exact groups; a MinHash-LSH component id for near-dup
    groups via ``operators.dedup.connected_components``).
    """
    fracs = [f for _, f in splits]
    if not splits or abs(sum(fracs) - 1.0) > 1e-9:
        raise ValueError("split fractions must sum to 1.0")
    bucket = sample_bucket_col(group_col)
    cum = 0.0
    expr: Column | None = None
    for name, frac in splits[:-1]:
        cum += frac
        thr = int(cum * _SAMPLE_BUCKETS)
        expr = (
            F.when(bucket < thr, F.lit(name))
            if expr is None
            else expr.when(bucket < thr, F.lit(name))
        )
    last = F.lit(splits[-1][0])
    split_col = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", split_col)


def leakage_safe_split_sql(
    group_expr: str, splits: list[tuple[str, float]]
) -> str:
    """DuckDB twin of :func:`leakage_safe_split`'s ``split`` column."""
    bucket = sample_bucket_sql(group_expr)
    cum = 0.0
    arms = []
    for name, frac in splits[:-1]:
        cum += frac
        arms.append(f"WHEN {bucket} < {int(cum * _SAMPLE_BUCKETS)} THEN '{name}'")
    if not arms:
        return f"'{splits[-1][0]}'"
    return "CASE " + " ".join(arms) + f" ELSE '{splits[-1][0]}' END"
