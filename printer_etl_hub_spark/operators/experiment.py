"""Shared experiment-analysis arithmetic for the A/B family.

q250's 2×2 conversion chi² and q279's Welch t are both pure functions
of a per-user frame; the batch plans (plans/relational.py) and the
streaming ``ab_sink`` (streaming/corpus.py) build that frame
differently — one scan vs. an incrementally-merged store — but MUST
share the statistic arithmetic verbatim so stream ≡ batch equivalence
is a property of the code, not a test-time coincidence (the
timeseries.py convention).

Arm assignment is the deterministic md5-parity gate (the q75/q78
assignment class): reproducible across engines, retries, and
partitionings — and, critically for the sink, across micro-batch
splits, because it depends only on the user id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Experiment salt baked into the arm hash (shared with the oracle SQL).
AB_SALT = "exp1"


def ab_arm(user_col: Column) -> Column:
    """True → arm A: parity of the first 60 bits of md5(user:salt)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(user_col.cast("string"), F.lit(f":{AB_SALT}"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    return F.pmod(h, F.lit(2)) == 0


def conversion_chi2_table(per_user: DataFrame) -> DataFrame:
    """q250's experiment readout from a per-user (arm_a, conv) frame →
    one row (n_a, conv_a, n_b, conv_b, rate_a, rate_b, chi2). The four
    cell counts are exact integers; chi2 = N·(ad−bc)²/((a+b)(c+d)(a+c)(b+d))
    is ONE fixed-order all-double expression — doubles (not DECIMAL
    products) on purpose, because (ad−bc)² at cluster scale exceeds
    DECIMAL(38,0) while the identical IEEE expression is engine-exact
    and overflow-free. NULLIF-guarded degenerate margins.
    """
    counts = per_user.agg(
        F.sum(F.when(F.col("arm_a"), 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("arm_a"), F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("conv_a"),
        F.sum(F.when(F.col("arm_a"), 0).otherwise(1)).cast("bigint").alias("n_b"),
        F.sum(F.when(F.col("arm_a"), 0).otherwise(F.col("conv")))
        .cast("bigint")
        .alias("conv_b"),
    )
    a = F.col("conv_a").cast("double")
    b = (F.col("n_a") - F.col("conv_a")).cast("double")
    c = F.col("conv_b").cast("double")
    d = (F.col("n_b") - F.col("conv_b")).cast("double")
    n = (F.col("n_a") + F.col("n_b")).cast("double")
    # NULLIF guards (the q234 degenerate-case discipline): an empty arm
    # or an all-/never-converted margin makes the rate/statistic
    # undefined — NULL, identically in both engines, never an error
    # (Spark ANSI raises on /0 where DuckDB yields NULL).
    chi2 = (
        n
        * (a * d - b * c)
        * (a * d - b * c)
        / F.nullif((a + b) * (c + d) * (a + c) * (b + d), F.lit(0.0))
    )
    return counts.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.round(a / F.nullif(F.col("n_a").cast("double"), F.lit(0.0)), 9).alias(
            "rate_a"
        ),
        F.round(c / F.nullif(F.col("n_b").cast("double"), F.lit(0.0)), 9).alias(
            "rate_b"
        ),
        F.round(chi2, 9).alias("chi2"),
    )


def welch_table(per_user: DataFrame) -> DataFrame:
    """q279's Welch t from a per-user (arm_a, x) frame → one row (n_a,
    n_b, mean_a, mean_b, var_num_a, var_num_b, t, df). x must be an
    exact integer outcome so the sufficient statistics (n, Σx, Σx²)
    stay exact DECIMAL sums; variance numerators n·Σx² − (Σx)² are
    DECIMAL(38,0) audit strings; t and the Welch–Satterthwaite df are
    fixed-order double expressions, NULLIF-guarded for n_g < 2.
    """
    dec = "decimal(38,0)"
    agg = per_user.agg(
        *[
            expr.alias(name)
            for arm, tag in ((True, "a"), (False, "b"))
            for name, expr in (
                (
                    f"n_{tag}",
                    F.sum(F.when(F.col("arm_a") == arm, 1).otherwise(0)).cast(
                        "bigint"
                    ),
                ),
                (
                    f"s_{tag}",
                    F.sum(
                        F.when(F.col("arm_a") == arm, F.col("x"))
                        .otherwise(0)
                        .cast(dec)
                    ).cast(dec),
                ),
                (
                    f"s2_{tag}",
                    F.sum(
                        F.when(
                            F.col("arm_a") == arm,
                            F.col("x").cast("decimal(19,0)") * F.col("x"),
                        )
                        .otherwise(0)
                        .cast(dec)
                    ).cast(dec),
                ),
            )
        ]
    )
    exprs = {}
    for tag in ("a", "b"):
        n = F.col(f"n_{tag}").cast(dec)
        var_num = (
            n * F.col(f"s2_{tag}") - F.col(f"s_{tag}") * F.col(f"s_{tag}")
        ).cast(dec)
        exprs[f"mean_{tag}"] = F.col(f"s_{tag}").cast("double") / F.nullif(
            F.col(f"n_{tag}"), F.lit(0)
        ).cast("double")
        exprs[f"var_num_{tag}"] = var_num
        # v_g = s_g^2/n_g = var_num / (n_g^2 (n_g - 1)) — exact integer
        # denominator, one double division
        exprs[f"v_{tag}"] = var_num.cast("double") / F.nullif(
            (n * n * (n - 1)).cast(dec), F.lit(0).cast(dec)
        ).cast("double")
    vsum = exprs["v_a"] + exprs["v_b"]
    tstat = (exprs["mean_a"] - exprs["mean_b"]) / F.nullif(F.sqrt(vsum), F.lit(0.0))
    df_w = (vsum * vsum) / F.nullif(
        exprs["v_a"] * exprs["v_a"]
        / F.nullif(F.col("n_a") - 1, F.lit(0)).cast("double")
        + exprs["v_b"] * exprs["v_b"]
        / F.nullif(F.col("n_b") - 1, F.lit(0)).cast("double"),
        F.lit(0.0),
    )
    guard = (F.col("n_a") > 1) & (F.col("n_b") > 1)
    return agg.select(
        "n_a",
        "n_b",
        F.round(exprs["mean_a"], 9).alias("mean_a"),
        F.round(exprs["mean_b"], 9).alias("mean_b"),
        exprs["var_num_a"].cast("string").alias("var_num_a"),
        exprs["var_num_b"].cast("string").alias("var_num_b"),
        F.when(guard, F.round(tstat, 9)).alias("t"),
        F.when(guard, F.round(df_w, 6)).alias("df"),
    )

def _d18(col: Column) -> Column:
    """Order-insensitive exact sum of a double expression through
    DECIMAL(38,18) (the statistic-term discipline; safe here — the
    terms are identical doubles built from exact integers)."""
    return F.sum(col.cast("decimal(38,18)")).cast("double")


def cohens_d_table(per_user: DataFrame) -> DataFrame:
    """q302's effect-size readout from a per-user (arm_a, x) frame →
    one row (n_a, n_b, mean_a, mean_b, pooled_sd, d, g) — factored
    here so the streaming ``ab_sink`` emits the IDENTICAL table off
    its incrementally-merged store (the welch_table convention). See
    the q302 docstring (plans/relational.py) for the exactness
    argument: exact DECIMAL(38,0) sufficient statistics, fixed-order
    double d/J/g, NULLIF-guarded degenerates."""
    dec = "decimal(38,0)"
    dec19 = "decimal(19,0)"
    agg = per_user.agg(
        F.sum(F.when(F.col("arm_a"), 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(~F.col("arm_a"), 1).otherwise(0)).cast("bigint").alias("n_b"),
        F.sum(F.when(F.col("arm_a"), F.col("x")).otherwise(0)).cast(dec).alias("s_a"),
        F.sum(F.when(~F.col("arm_a"), F.col("x")).otherwise(0)).cast(dec).alias("s_b"),
        F.sum(
            F.when(F.col("arm_a"), F.col("x").cast(dec19) * F.col("x")).otherwise(0)
        ).cast(dec).alias("q_a"),
        F.sum(
            F.when(~F.col("arm_a"), F.col("x").cast(dec19) * F.col("x")).otherwise(0)
        ).cast(dec).alias("q_b"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    mean_a = F.col("s_a").cast("double") / F.nullif(na, F.lit(0.0))
    mean_b = F.col("s_b").cast("double") / F.nullif(nb, F.lit(0.0))
    ssq_a = (
        (F.col("n_a").cast(dec) * F.col("q_a") - F.col("s_a") * F.col("s_a"))
        .cast(dec)
        .cast("double")
        / F.nullif(na, F.lit(0.0))
    )
    ssq_b = (
        (F.col("n_b").cast(dec) * F.col("q_b") - F.col("s_b") * F.col("s_b"))
        .cast(dec)
        .cast("double")
        / F.nullif(nb, F.lit(0.0))
    )
    df = na + nb - F.lit(2.0)
    sp = F.sqrt((ssq_a + ssq_b) / F.nullif(df, F.lit(0.0)))
    d = (mean_a - mean_b) / F.nullif(sp, F.lit(0.0))
    jcorr = F.lit(1.0) - F.lit(3.0) / F.nullif(
        F.lit(4.0) * df - F.lit(1.0), F.lit(0.0)
    )
    guard = (F.col("n_a") > 1) & (F.col("n_b") > 1)
    return agg.select(
        "n_a",
        "n_b",
        F.round(mean_a, 9).alias("mean_a"),
        F.round(mean_b, 9).alias("mean_b"),
        F.when(guard, F.round(sp, 9)).alias("pooled_sd"),
        F.when(guard, F.round(d, 9)).alias("d"),
        F.when(guard, F.round(d * jcorr, 9)).alias("g"),
    )


def cmh_table(cells: DataFrame) -> DataFrame:
    """q303's Cochran-Mantel-Haenszel readout from a per-stratum 2×2
    cell frame (stratum, a, b, c, d) → per-stratum rows with the
    pooled OR_MH and CMH repeated — factored here so the streaming
    ``cmh_sink`` emits the IDENTICAL table off its incrementally-merged
    cell store. See the q303 docstring for the exactness argument."""
    ad_, bd_, cd_, dd_ = (F.col(c).cast("double") for c in ("a", "b", "c", "d"))
    nd_ = ad_ + bd_ + cd_ + dd_
    r_s = ad_ * dd_ / F.nullif(nd_, F.lit(0.0))
    s_s = bd_ * cd_ / F.nullif(nd_, F.lit(0.0))
    e_s = (ad_ + bd_) * (ad_ + cd_) / F.nullif(nd_, F.lit(0.0))
    v_s = (
        (ad_ + bd_) * (cd_ + dd_) * (ad_ + cd_) * (bd_ + dd_)
        / F.nullif(nd_ * nd_ * (nd_ - F.lit(1.0)), F.lit(0.0))
    )
    terms = cells.select(
        "stratum", "a", "b", "c", "d",
        (ad_ * dd_ / F.nullif(bd_ * cd_, F.lit(0.0))).alias("or_stratum"),
        r_s.alias("r_s"), s_s.alias("s_s"), e_s.alias("e_s"), v_s.alias("v_s"),
    )
    pooled = terms.agg(
        F.sum("a").cast("bigint").alias("sum_a"),
        _d18(F.col("r_s")).alias("sr"),
        _d18(F.col("s_s")).alias("ss"),
        _d18(F.col("e_s")).alias("se"),
        _d18(F.coalesce(F.col("v_s"), F.lit(0.0))).alias("sv"),
    )
    or_mh = F.col("sr") / F.nullif(F.col("ss"), F.lit(0.0))
    dev = F.col("sum_a").cast("double") - F.col("se")
    cmh = dev * dev / F.nullif(F.col("sv"), F.lit(0.0))
    return (
        terms.join(F.broadcast(pooled))
        .select(
            "stratum", "a", "b", "c", "d",
            F.round(F.col("or_stratum"), 9).alias("or_stratum"),
            F.round(or_mh, 9).alias("or_mh"),
            F.round(cmh, 9).alias("cmh"),
        )
        .orderBy("stratum")
    )

