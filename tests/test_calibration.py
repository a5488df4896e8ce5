"""Calibration operators: isotonic (PAVA) fit and quantile normalization.

Three layers of evidence:

1. Math identity — the minimax formula the plan computes,
   ``fit(k) = max_{i<=k} min_{j>=k} mean(i..j)``, equals classic
   pool-adjacent-violators on random weighted instances, verified in
   exact Fraction arithmetic (no engine involved).
2. Engine parity — the Spark result equals a pure-pandas
   reimplementation of the *quantized* minimax on the real sf0.001
   rows (the DuckDB side is covered by the registered oracle sweep).
3. Contract properties — the fit is monotone non-decreasing; QN ranks
   are a 1..n permutation per store and the reference distribution is
   the exact floor-quantized cross-store mean.
"""

from __future__ import annotations

import random
from fractions import Fraction

import duckdb
import pandas as pd

from project2_bigdata_spark.plans import REGISTRY


def _pava_weighted_points(y: list[Fraction], w: list[int]) -> list[Fraction]:
    """PAVA over weighted points, returning one fit value per point."""
    blocks: list[list] = []  # [sum, weight, n_points]
    for yi, wi in zip(y, w):
        blocks.append([yi * wi, wi, 1])
        while len(blocks) > 1:
            s1, w1, n1 = blocks[-2]
            s2, w2, n2 = blocks[-1]
            if s1 * w2 <= s2 * w1:
                break
            blocks.pop()
            blocks[-1] = [s1 + s2, w1 + w2, n1 + n2]
    out: list[Fraction] = []
    for s, ww, n in blocks:
        out.extend([Fraction(s, ww)] * n)
    return out


def _minimax(y: list[Fraction], w: list[int]) -> list[Fraction]:
    n = len(y)
    pre_s = [Fraction(0)]
    pre_w = [0]
    for yi, wi in zip(y, w):
        pre_s.append(pre_s[-1] + yi * wi)
        pre_w.append(pre_w[-1] + wi)
    out = []
    for k in range(n):
        best = None
        for i in range(k + 1):
            lo = min(
                Fraction(pre_s[j + 1] - pre_s[i], pre_w[j + 1] - pre_w[i])
                for j in range(k, n)
            )
            best = lo if best is None or lo > best else best
        out.append(best)
    return out


def test_minimax_equals_pava_exact():
    """The plan's minimax characterization IS isotonic regression:
    exact-Fraction equality with pool-adjacent-violators on random
    weighted instances."""
    rng = random.Random(42)
    for _ in range(40):
        n = rng.randint(1, 12)
        y = [Fraction(rng.randint(-50, 50), rng.randint(1, 9)) for _ in range(n)]
        w = [rng.randint(1, 5) for _ in range(n)]
        assert _minimax(y, w) == _pava_weighted_points(y, w)


def _fdiv(num: int, den: int) -> int:
    """The shared cross-engine floor-division identity."""
    return (num - (((num % den) + den) % den)) // den


def test_isotonic_matches_python_reimplementation(spark, sf_dir):
    """Spark fit == pure-Python quantized minimax on the same rows."""
    df = REGISTRY["isotonic_discount_quantity"].fn(spark, sf_dir).toPandas()
    per = duckdb.sql(
        f"""
        SELECT CAST(l_quantity AS BIGINT) AS rung,
               COUNT(*) AS n,
               SUM(CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)) AS s
        FROM '{sf_dir}/lineitem.parquet' GROUP BY 1 ORDER BY 1
        """
    ).df()
    rungs = per["rung"].tolist()
    ns = [int(x) for x in per["n"]]
    ss = [int(x) for x in per["s"]]
    pre_n = [0]
    pre_s = [0]
    for n_, s_ in zip(ns, ss):
        pre_n.append(pre_n[-1] + n_)
        pre_s.append(pre_s[-1] + s_)
    nn = len(rungs)
    fit = {}
    for k in range(nn):
        best = None
        for i in range(k + 1):
            lo = min(
                _fdiv((pre_s[j + 1] - pre_s[i]) * 10000, pre_n[j + 1] - pre_n[i])
                for j in range(k, nn)
            )
            best = lo if best is None or lo > best else best
        fit[rungs[k]] = best
    got = dict(zip(df["rung"], df["fit_micro"]))
    assert got == fit
    # contract: the fit is monotone non-decreasing in rung
    ordered = df.sort_values("rung")["fit_micro"].tolist()
    assert ordered == sorted(ordered)
    # per-rung means are the quantized raw means
    mean = dict(zip(df["rung"], df["mean_micro"]))
    for r, n_, s_ in zip(rungs, ns, ss):
        assert mean[r] == _fdiv(s_ * 10000, n_)


def test_quantile_normalize_contract(spark, sf_dir):
    """Ranks are a 1..n permutation per store; the reference value at
    each rank is the exact floor-quantized mean of that rank's revenue
    cents across stores; mapped values are monotone in rank."""
    df = REGISTRY["quantile_normalize_store_daily"].fn(spark, sf_dir).toPandas()
    for _, g in df.groupby("store"):
        rks = sorted(g["rk"].tolist())
        assert rks == list(range(1, len(g) + 1))
        by_rk = g.sort_values("rk")
        # revenue is non-decreasing along the rank order (the sort key).
        # NOTE: qn_value need NOT be monotone in rank — stores with
        # fewer days drop out of the high-rank means, so the reference
        # sequence can dip where the contributing store set shrinks.
        assert by_rk["revenue"].is_monotonic_increasing or len(g) == 1
    # reference distribution: exact floor-quantized cross-store mean
    cents = (df["revenue"] * 100).round().astype("int64")
    ref = (
        pd.DataFrame({"rk": df["rk"], "cents": cents})
        .groupby("rk")["cents"]
        .agg(["count", "sum"])
    )
    for rk, row in ref.iterrows():
        expect = _fdiv(int(row["sum"]) * 10000, int(row["count"]))
        got = df.loc[df["rk"] == rk, "qn_micro"].unique()
        assert list(got) == [expect], rk
