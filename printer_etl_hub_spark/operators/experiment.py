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
