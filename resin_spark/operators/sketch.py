"""Deterministic sketching (SURVEY §2 block E extras).

Approximate distinct counting and order statistics whose results are
bit-reproducible across engines — unlike HLL/approx_percentile, whose
register layouts are implementation-private, these sketches are defined
purely in terms of md5 order statistics / SQL-standard discrete
quantiles, so the DuckDB oracle checks the ESTIMATES exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from resin_spark.functions import text as T

Tables = dict[str, DataFrame]

KMV_K = 16
_HEX = "0123456789abcdef"
_FRAC_BITS = 48  # first 12 hex chars of md5 -> uint48 position in hash space


def kmv_distinct(t: Tables, k: int = KMV_K) -> DataFrame:
    """K-minimum-values distinct-count sketch per event_type: hash every
    user to md5, keep each group's k smallest distinct hashes, and
    estimate |distinct| = (k-1) / position(k-th hash). Estimates are
    deterministic — same data, same estimate, any engine — which is the
    property that makes sketch results mergeable AND auditable; exact
    counts ride along to show the error.

    Scale: distinct (type, hash) is one shuffle; ranking k per group is
    a window over groups (each group's distinct hashes land in one
    partition — the group count is the operator's parallelism, same as
    any per-group top-k). When the group has < k hashes the sketch is
    exact by definition.
    """
    ev = t["events"]
    hashes = (
        ev.select("event_type",
                  F.md5(F.col("user_id").cast("string")).alias("h"))
        .distinct()
    )
    w = Window.partitionBy("event_type").orderBy("h")
    kth = (
        hashes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == k)
        .select("event_type",
                F.conv(F.substring("h", 1, _FRAC_BITS // 4), 16, 10)
                .cast("long").alias("kth_pos"))
    )
    exact = hashes.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_exact"))
    est = F.col("kth_pos") / F.lit(float(1 << _FRAC_BITS))
    return (
        exact.join(kth, "event_type", "left")
        .select(
            "event_type", "n_exact",
            F.coalesce((k - 1) / est, F.col("n_exact").cast("double"))
            .alias("kmv_estimate"),
        )
        .orderBy("event_type")
    )


def kmv_distinct_oracle(k: int = KMV_K) -> str:
    nhex = _FRAC_BITS // 4
    pos = (
        f"list_reduce(list_transform(string_split(substr(h, 1, {nhex}), ''),"
        f" c -> CAST(strpos('{_HEX}', c) - 1 AS BIGINT)), (a, b) -> a * 16 + b)"
    )
    return f"""
    WITH hashes AS (
        SELECT DISTINCT event_type, md5(CAST(user_id AS VARCHAR)) AS h
        FROM events
    ),
    ranked AS (
        SELECT event_type, h,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM hashes
    ),
    kth AS (
        SELECT event_type, {pos} AS kth_pos FROM ranked WHERE rn = {k}
    ),
    exact AS (
        SELECT event_type, COUNT(*) AS n_exact FROM hashes GROUP BY event_type
    )
    SELECT e.event_type, e.n_exact,
           COALESCE(({k} - 1) / (kth_pos / {float(1 << _FRAC_BITS)}),
                    e.n_exact::DOUBLE) AS kmv_estimate
    FROM exact e LEFT JOIN kth USING (event_type)
    ORDER BY event_type
    """


QUANTILES = (0.25, 0.5, 0.75, 0.95)


def price_quantiles(t: Tables) -> DataFrame:
    """SQL-standard discrete quantiles of l_extendedprice per return
    flag — ``percentile_disc`` picks actual data values (smallest value
    whose cumulative distribution reaches p), so unlike interpolated /
    approximate percentiles the result is engine-exact.

    Spark's native ``percentile_disc`` plans as an ObjectHashAggregate
    whose partial state buffers the FULL value list once per quantile
    (4 copies here) — measured 5.6s at sf0.1. This implementation makes
    one sorted window pass instead: row_number + group count, then the
    SQL-standard definition "smallest value whose cume_dist >= p"
    evaluated as the exact integer comparison ``rn * 100 >= p100 * n``
    (no float rank math), aggregated with min(when(...)). Same single
    shuffle on the group key, but the state per row is two longs and
    everything stays in whole-stage codegen — 5.6s -> 1.7s at sf0.1
    (remaining cost is the per-group sort; group count bounds the
    window's parallelism, fine while groups >> executors).
    """
    li = t["lineitem"]
    d = li.select("l_returnflag", "l_extendedprice")
    # NULL prices: percentile_disc is an ordered-set aggregate — the
    # standard (and DuckDB) SKIPS NULLs, so the rank/count window runs
    # over the NON-NULL subset only (Spark's ASC default is NULLS
    # FIRST, which would shift every quantile position — r7 rel-fuzz
    # find, seed 9000). n_rows still counts every row, like COUNT(*).
    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    wg = Window.partitionBy("l_returnflag")
    vals = (
        d.filter(F.col("l_extendedprice").isNotNull())
        .withColumn("rn", F.row_number().over(w))
        .withColumn("nv", F.count(F.lit(1)).over(wg))
    )
    aggs = [
        F.min(
            F.when(F.col("rn") * 100 >= int(q * 100) * F.col("nv"),
                   F.col("l_extendedprice"))
        ).alias(f"p{int(q * 100)}")
        for q in QUANTILES
    ]
    counts = d.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n_rows"))
    quants = vals.groupBy("l_returnflag").agg(*aggs) \
        .withColumnRenamed("l_returnflag", "rf")
    # left join: a group whose every price is NULL keeps its row count
    # and reports NULL quantiles (percentile_disc over zero values).
    # NULL-SAFE equality: GROUP BY groups NULL flags together in both
    # engines, but a plain equi-join would never match that group's two
    # halves, reporting NULL quantiles where DuckDB returns real values
    # (ADVICE r7). EqualNullSafe is a hash-joinable key, so the plan is
    # unchanged.
    return (
        counts.join(quants, F.col("l_returnflag").eqNullSafe(F.col("rf")),
                    "left")
        .select("l_returnflag", "n_rows",
                *[f"p{int(q * 100)}" for q in QUANTILES])
        .orderBy("l_returnflag")
    )


def price_quantiles_oracle() -> str:
    cols = ",\n           ".join(
        f"percentile_disc({q}) WITHIN GROUP (ORDER BY l_extendedprice)"
        f" AS p{int(q * 100)}"
        for q in QUANTILES
    )
    return f"""
    SELECT l_returnflag, COUNT(*) AS n_rows,
           {cols}
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """


# --- HyperLogLog distinct sketch (deterministic registers) -------------------

HLL_B = 256            # registers (bucket bits = 8)
_HLL_HASH_BITS = 60    # md5-derived hash width
_HLL_W_BITS = _HLL_HASH_BITS - 8
# alpha_256 * B^2 * 2^52 — one Python-computed double literal shared by
# both engines so the estimate division is a single identical IEEE op
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_B)
_HLL_NUM = _HLL_ALPHA * HLL_B * HLL_B * float(1 << _HLL_W_BITS)


def hll_registers(ev: DataFrame) -> DataFrame:
    """(event_type, bucket, m): the deterministic HLL register table —
    the SHARED expression between the batch sketch and its streaming
    twin (streaming/events.stream_hll_registers), so the streaming
    state provably equals the batch registers. Works unchanged on a
    static or streaming DataFrame (groupBy-max is a streaming-legal
    stateful aggregate whose state is register-table-sized)."""
    from resin_spark.operators.dedup import _token_hash60
    h = _token_hash60(F.col("user_id").cast("string"))
    # bucket/w split must be integer-exact: h reaches 2^60 (> 2^53), so
    # float division would corrupt buckets — shift/mask instead
    hashed = ev.select(
        "event_type",
        F.shiftright(h, _HLL_W_BITS).alias("bucket"),
        h.bitwiseAND(F.lit((1 << _HLL_W_BITS) - 1).cast("long")).alias("w"),
    )
    return (
        hashed
        .withColumn("rho", (F.lit(_HLL_W_BITS + 1)
                            - F.length(F.bin("w"))).cast("int"))
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("m"))
    )


def hll_distinct(t: Tables) -> DataFrame:
    """HyperLogLog distinct-count sketch per event_type with fully
    DETERMINISTIC registers: bucket = top 8 bits of the 60-bit md5
    hash, rho = leading-zero rank of the remaining 52 bits. Unlike
    Spark's approx_count_distinct (private register layout), every
    register value is a pure function of the data, so the DuckDB
    oracle checks the ESTIMATES exactly — the mergeable-sketch
    counterpart of kmv_distinct (register max-merge is what a
    100 TB rollup tree or a streaming accumulator needs: partial
    aggregation IS the sketch union).

    Exactness: the register sum folds 2^(52-M) as exact integers
    (max 256·2^52 = 2^60, inside long/HUGEINT range), the estimate is
    one double division by a shared precomputed literal, and the
    small-range linear-counting branch (E ≤ 2.5B with empty
    registers) uses ln rounded at 6 decimals — both engines agree far
    inside the grain. rho caps at 52 (w = 0 folds into the top
    register class — deterministic, bias ≪ the sketch's own error).

    Scale: no distinct pre-shuffle (max is idempotent over duplicate
    users); ONE shuffle to |groups| × 256 register rows with map-side
    partial max — at any corpus size the post-shuffle state is
    register-table-sized. Exact counts ride along to show the error.
    """
    ev = t["events"].filter(F.col("user_id").isNotNull())
    regs = hll_registers(ev)
    # shiftleft via expr: the PySpark function form takes a Python-int
    # shift amount, but the SQL form accepts a column expression
    per_group = regs.groupBy("event_type").agg(
        F.sum(F.expr(f"shiftleft(1L, {_HLL_W_BITS} - m)")).alias("s_used"),
        F.count(F.lit(1)).alias("used"),
    )
    exact = (
        ev.select("event_type", "user_id").distinct()
        .groupBy("event_type").agg(F.count(F.lit(1)).alias("n_exact"))
    )
    zeros = F.lit(HLL_B) - F.col("used")
    s_total = (F.col("s_used")
               + zeros * (F.lit(1).cast("long") * (1 << _HLL_W_BITS)))
    e_raw = F.lit(_HLL_NUM) / s_total.cast("double")
    lin = F.lit(float(HLL_B)) * F.log(F.lit(float(HLL_B))
                                      / zeros.cast("double"))
    est = F.when((e_raw <= 2.5 * HLL_B) & (zeros > 0), lin).otherwise(e_raw)
    return (
        per_group.join(exact, "event_type")
        .select(
            "event_type", "n_exact",
            F.col("used").cast("bigint").alias("registers_used"),
            F.round(est, 6).alias("hll_estimate"),
        )
        .orderBy("event_type")
    )


def hll_distinct_oracle() -> str:
    from resin_spark.operators.dedup import _token_hash60_sql
    pos15 = _token_hash60_sql("CAST(user_id AS VARCHAR)")
    W = 1 << _HLL_W_BITS
    return f"""
    WITH hashed AS (
        SELECT event_type,
               CAST(h // {W} AS BIGINT) AS bucket,
               h % {W} AS w
        FROM (
            SELECT event_type, {pos15} AS h
            FROM events WHERE user_id IS NOT NULL
        )
    ), regs AS (
        SELECT event_type, bucket,
               MAX({_HLL_W_BITS + 1} - length(bin(w))) AS m
        FROM hashed GROUP BY event_type, bucket
    ), per_group AS (
        SELECT event_type,
               CAST(SUM(1::BIGINT << ({_HLL_W_BITS} - m)) AS BIGINT) AS s_used,
               COUNT(*) AS used
        FROM regs GROUP BY event_type
    ), exact AS (
        SELECT event_type, COUNT(*) AS n_exact
        FROM (SELECT DISTINCT event_type, user_id
              FROM events WHERE user_id IS NOT NULL)
        GROUP BY event_type
    )
    SELECT p.event_type, e.n_exact,
           CAST(used AS BIGINT) AS registers_used,
           round(CASE WHEN {_HLL_NUM!r} / CAST(s_used
                          + ({HLL_B} - used) * ({W}::BIGINT) AS DOUBLE)
                          <= {2.5 * HLL_B}
                      AND ({HLL_B} - used) > 0
                 THEN {float(HLL_B)!r} * ln({float(HLL_B)!r}
                          / CAST({HLL_B} - used AS DOUBLE))
                 ELSE {_HLL_NUM!r} / CAST(s_used
                          + ({HLL_B} - used) * ({W}::BIGINT) AS DOUBLE)
                 END, 6) AS hll_estimate
    FROM per_group p JOIN exact e USING (event_type)
    ORDER BY p.event_type
    """


# --- Count-Min sketch heavy hitters ------------------------------------------

CMS_D = 4       # hash rows
CMS_W = 1024    # counters per row
CMS_TOPK = 20


def cms_counters(toks: DataFrame, d: int = CMS_D,
                 w: int = CMS_W) -> DataFrame:
    """(j, c, cnt): the Count-Min counter table — the SHARED expression
    between the batch sketch and its streaming twin
    (streaming/events.stream_cms_counters). Counter addition is a
    streaming-legal stateful sum whose state is d×w rows forever."""
    from resin_spark.operators.dedup import _token_hash60
    rows = toks.select(
        "tok",
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("j"),
                     (_token_hash60(F.concat_ws("@", "tok", F.lit(str(j))))
                      % w).alias("c"))
            for j in range(d)
        ])).alias("p"),
    ).select("p.j", "p.c")
    return rows.groupBy("j", "c").agg(F.count(F.lit(1)).alias("cnt"))


def cms_heavy_hitters(t: Tables, d: int = CMS_D, w: int = CMS_W,
                      topk: int = CMS_TOPK) -> DataFrame:
    """Count-Min sketch over corpus token frequencies, evaluated on the
    exact top-``topk`` tokens: per token, the CMS estimate (min over
    ``d`` hashed counters) beside the exact count and the collision
    surplus. CMS is the third classic mergeable sketch next to KMV and
    HLL — counter ADDITION is partial aggregation, so per-shard
    sketches sum into the corpus sketch without touching raw tokens —
    and like the others its state here is a pure function of the data
    (md5-derived row hashes), so the oracle checks estimates exactly.

    Guarantee surfaced in the output: cms_estimate >= exact_tf always
    (one-sided overestimate; pinned in tests with a scalar Python
    reimplementation), with surplus ≤ ε·N at probability 1−δ for
    w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.

    Scale: the token stream fans out ×``d`` into a groupBy whose
    post-shuffle state is the d×w counter table (4096 rows at any
    corpus size — map-side partial sums do the compression); the
    exact top-k ranking is the same tf aggregate term_frequencies
    already runs, and the estimate join probes the counter table with
    a ``topk``-row broadcast.
    """
    from resin_spark.operators.dedup import _token_hash60

    toks = (
        t["documents"].filter(F.col("doc_id").isNotNull())
        .select(F.explode(T.tokens("text")).alias("tok"))
    )
    counters = cms_counters(toks, d, w).localCheckpoint(eager=False)
    top = (
        toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_tf"))
        .orderBy(F.col("exact_tf").desc(), "tok").limit(topk)
    )
    probed = top
    ests = []
    for j in range(d):
        cj = counters.filter(F.col("j") == j) \
            .select(F.col("c").alias(f"c{j}"), F.col("cnt").alias(f"cnt{j}"))
        probed = probed.withColumn(
            f"c{j}",
            _token_hash60(F.concat_ws("@", "tok", F.lit(str(j)))) % w,
        ).join(F.broadcast(cj), f"c{j}")
        ests.append(F.col(f"cnt{j}"))
    return (
        probed.select(
            "tok", "exact_tf",
            F.least(*ests).alias("cms_estimate"),
            (F.least(*ests) - F.col("exact_tf")).alias("surplus"),
        )
        .orderBy(F.col("exact_tf").desc(), "tok")
    )


def cms_heavy_hitters_oracle(d: int = CMS_D, w: int = CMS_W,
                             topk: int = CMS_TOPK) -> str:
    from resin_spark.operators.dedup import _token_hash60_sql
    tk = T.tokens_sql("text")

    def col_expr(j: int, tok_expr: str = "tok") -> str:
        e = tok_expr + " || '@' || '" + str(j) + "'"
        return f"({_token_hash60_sql(e)}) % {w}"

    counter_union = "\n        UNION ALL\n".join(
        f"        SELECT {j} AS j, {col_expr(j)} AS c FROM toks"
        for j in range(d)
    )
    est_joins = "\n    ".join(
        f"JOIN counters k{j} ON k{j}.j = {j} AND k{j}.c = {col_expr(j, 'top.tok')}"
        for j in range(d)
    )
    least = "LEAST(" + ", ".join(f"k{j}.cnt" for j in range(d)) + ")"
    return f"""
    WITH toks AS (
        SELECT unnest({tk}) AS tok
        FROM documents WHERE doc_id IS NOT NULL
    ), rows_ AS (
{counter_union}
    ), counters AS (
        SELECT j, c, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM rows_ GROUP BY j, c
    ), top AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_tf
        FROM toks GROUP BY tok
        ORDER BY exact_tf DESC, tok LIMIT {topk}
    )
    SELECT top.tok, top.exact_tf,
           {least} AS cms_estimate,
           {least} - top.exact_tf AS surplus
    FROM top
    {est_joins}
    ORDER BY top.exact_tf DESC, top.tok
    """
