"""Distributed stream sketches: HyperLogLog count-distinct, Count-Min
frequency, KMV distinct-value sampling with set-operation estimates.

HyperLogLog (Flajolet, Fusy, Gandouet, Meunier 2007) with a deterministic,
SQL-reproducible hash — the same reproducibility rule as
``functions/sketches._shingle_hashes``: md5-u32 of the key's string form,
the top ``b`` bits select one of ``m = 2^b`` registers, and
``rho = (32-b) - bit_length(remaining bits) + 1`` (the 1-based position of
the leftmost set bit; an all-zero remainder scores ``32-b+1``).

Scale shape (the 100-TB discipline):

- a per-batch combiner emits at most one int row per (group, register) —
  the shuffle moves ``groups × m`` rows per batch, never the raw keys;
- a ``groupby Max`` merges batches. HLL registers merge by max, so the
  result is a pure function of the key SET — independent of partitioning,
  batch boundaries, duplication across blocks, and cluster size;
- the estimator runs per group over its ≤ m register rows (``map_groups``
  on a table bounded by groups × m).

The register table (``hll_registers``) is the exact-match oracle surface —
every column is an integer. The double-valued estimate (``hll_distinct``)
is a pure function of the registers; its accuracy is pytest-gated (the
standard-HLL relative error is ~1.04/sqrt(m)) rather than hash-gated,
because ``ln`` in the linear-counting branch is libm- not IEEE-pinned.
"""

from __future__ import annotations

import hashlib
import math

import pyarrow as pa

import ray.data


def _u32(key) -> int:
    return int(hashlib.md5(str(key).encode("utf-8")).hexdigest()[:8], 16)


def hll_registers(
    ds: ray.data.Dataset,
    key_col: str,
    group_col: str,
    b: int = 6,
) -> ray.data.Dataset:
    """Per-group HLL register table: one row per (group, bucket) with the
    max rho observed for that register — at most ``2^b`` rows per group
    (buckets no key hashed into are absent, not zero-filled)."""
    from ray.data.aggregate import Max

    width = 32 - b
    mask = (1 << width) - 1

    def _partial(batch: pa.Table) -> pa.Table:
        regs: dict[tuple, int] = {}
        for g, k in zip(batch[group_col].to_pylist(), batch[key_col].to_pylist()):
            u = _u32(k)
            rem = u & mask
            rho = width - rem.bit_length() + 1
            key = (g, u >> width)
            if regs.get(key, 0) < rho:
                regs[key] = rho
        ks = list(regs)
        return pa.table(
            {
                group_col: pa.array([k[0] for k in ks]),
                "bucket": pa.array([k[1] for k in ks], pa.int64()),
                "rho": pa.array([regs[k] for k in ks], pa.int64()),
            }
        )

    return (
        ds.select_columns([group_col, key_col])
        .map_batches(_partial, batch_format="pyarrow")
        .groupby([group_col, "bucket"])
        .aggregate(Max("rho", alias_name="rho"))
    )


def hll_distinct(
    ds: ray.data.Dataset,
    key_col: str,
    group_col: str,
    b: int = 6,
) -> ray.data.Dataset:
    """Per-group approximate count-distinct: the standard HLL estimator
    (bias-corrected raw estimate, linear counting below 2.5m when empty
    registers remain) over :func:`hll_registers`. Output one row per group:
    the integer register digests plus the double ``hll_estimate``."""
    import pandas as pd

    m = 1 << b
    # alpha_m per the HLL paper (m >= 128 uses the closed form)
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))

    def _estimate(g: pd.DataFrame) -> pd.DataFrame:
        rho = dict(zip(g["bucket"], g["rho"]))
        s = sum(2.0 ** -rho.get(j, 0) for j in range(m))
        raw = alpha * m * m / s
        zeros = m - len(rho)
        if raw <= 2.5 * m and zeros > 0:
            est = m * math.log(m / zeros)
        else:
            est = raw
        return pd.DataFrame(
            {
                group_col: [g[group_col].iloc[0]],
                "m": pd.array([m], dtype="int64"),
                "n_nonzero": pd.array([len(rho)], dtype="int64"),
                "sum_rho": pd.array([int(g["rho"].sum())], dtype="int64"),
                "max_rho": pd.array([int(g["rho"].max())], dtype="int64"),
                "hll_estimate": [est],
            }
        )

    return hll_registers(ds, key_col, group_col, b=b).groupby(group_col).map_groups(
        _estimate, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# Count-Min sketch: frequency estimation / heavy hitters (Cormode &
# Muthukrishnan 2005). Same SQL-reproducibility rule as HLL above: every
# counter is an integer keyed by md5-u32 cells, so the sketch — and any
# estimate read from it — is an exact-match oracle surface.
# ---------------------------------------------------------------------------


def cms_table(
    ds: ray.data.Dataset,
    key_col: str,
    d: int = 4,
    w: int = 256,
    seed: str = "cms",
) -> ray.data.Dataset:
    """Count-Min sketch counter table: one row per touched ``(j, cell)``
    with the total count of keys hashing there (``cell =
    md5_u32("{seed}:{j}:{key}") % w`` for each of the ``d`` hash rows).

    Scale shape: the per-batch combiner counts keys WITHIN the batch first
    (one md5 per distinct key per batch per row j), emits ≤ d × distinct
    partial rows, and a ``groupby Sum`` merges batches — counters are
    additive, so the sketch is a pure function of the multiset of keys,
    independent of partitioning and batch boundaries. Total state ≤ d·w
    int rows no matter the input size: THE bounded-memory frequency
    structure for a 100-TB stream."""
    from collections import Counter

    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        cnt = Counter(batch[key_col].to_pylist())
        js: list[int] = []
        cells: list[int] = []
        ns: list[int] = []
        for key, n in cnt.items():
            for j in range(d):
                js.append(j)
                cells.append(_u32(f"{seed}:{j}:{key}") % w)
                ns.append(n)
        return pa.table(
            {
                "j": pa.array(js, pa.int64()),
                "cell": pa.array(cells, pa.int64()),
                "n": pa.array(ns, pa.int64()),
            }
        )

    return (
        ds.select_columns([key_col])
        .map_batches(_partial, batch_format="pyarrow")
        .groupby(["j", "cell"])
        .aggregate(Sum("n", alias_name="n"))
    )


def kmv_registers(
    ds: ray.data.Dataset,
    key_col: str,
    group_col: str,
    k: int = 128,
) -> ray.data.Dataset:
    """Per-group KMV (k-minimum-values) sketch: the ``k`` smallest DISTINCT
    md5-u32 hashes of the key column, one row per (group, h) — at most
    ``k`` rows per group (Bar-Yossef et al. 2002; Beyer et al. 2007 for
    the multi-set/Jaccard use).

    Scale shape (same discipline as :func:`hll_registers`): the per-batch
    combiner emits ≤ k distinct-hash ints per group per batch, a
    ``groupby(group).map_groups`` merge keeps the k smallest distinct —
    the result is a pure function of the key SET, independent of
    partitioning, duplication, and cluster size. Unlike HLL, a KMV sketch
    supports SET OPERATIONS: merging two groups' sketches estimates their
    union, and membership overlap inside the merged sketch estimates
    Jaccard (see :func:`kmv_group_jaccard`). Integer-exact oracle surface.
    """
    import numpy as np
    import pandas as pd

    def _partial(batch: pa.Table) -> pa.Table:
        by_group: dict = {}
        for g, key in zip(batch[group_col].to_pylist(), batch[key_col].to_pylist()):
            by_group.setdefault(g, set()).add(_u32(key))
        gs: list = []
        hs: list[int] = []
        for g, hset in by_group.items():
            smallest = sorted(hset)[:k]
            gs.extend([g] * len(smallest))
            hs.extend(smallest)
        return pa.table({group_col: pa.array(gs), "h": pa.array(hs, pa.int64())})

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        hs = np.sort(g["h"].unique())[:k]
        return pd.DataFrame({group_col: [g[group_col].iloc[0]] * len(hs), "h": hs})

    return (
        ds.select_columns([group_col, key_col])
        .map_batches(_partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(_merge, batch_format="pandas")
    )


def kmv_group_jaccard(
    ds: ray.data.Dataset,
    key_col: str,
    group_col: str,
    k: int = 128,
) -> "object":
    """Estimated key-set overlap between every pair of groups from their
    KMV sketches (audience-overlap at stream scale: the sketches are the
    only state, ``groups × k`` int rows total).

    For groups A, B: merge the two sketches, keep the k smallest distinct
    hashes (the union sketch), count how many of those appear in BOTH —
    ``est_jaccard = n_common / n_union_sketch`` (the standard KMV Jaccard
    estimator). Returns a pandas frame (bounded by ``|groups|²`` rows):
    ``(group_a, group_b, n_sketch_a, n_sketch_b, n_union_sketch,
    n_common, est_jaccard)``. ``est_jaccard`` is a ratio of two small
    ints computed identically on the SQL side — bit-exact.

    The pairwise combine runs on the driver over the collected sketch
    table — bounded by construction (sketches, not data), the same
    driver-contract shape as :func:`cms_heavy_hitters`.
    """
    import pandas as pd

    sk = kmv_registers(ds, key_col, group_col, k=k).to_pandas()
    sketches = {g: set(sub["h"]) for g, sub in sk.groupby(group_col)}
    rows = []
    for ga in sorted(sketches):
        for gb in sorted(sketches):
            if ga >= gb:
                continue
            a, b = sketches[ga], sketches[gb]
            union_sketch = sorted(a | b)[:k]
            n_union = len(union_sketch)
            n_common = sum(1 for h in union_sketch if h in a and h in b)
            rows.append(
                {
                    "group_a": ga,
                    "group_b": gb,
                    "n_sketch_a": len(a),
                    "n_sketch_b": len(b),
                    "n_union_sketch": n_union,
                    "n_common": n_common,
                    "est_jaccard": n_common / n_union if n_union else 0.0,
                }
            )
    return pd.DataFrame(rows)


def cms_heavy_hitters(
    ds: ray.data.Dataset,
    key_col: str,
    threshold: int,
    d: int = 4,
    w: int = 256,
    seed: str = "cms",
) -> ray.data.Dataset:
    """Keys whose Count-Min ESTIMATE reaches ``threshold``, with both the
    estimate and the exact count: ``(key, n_exact, n_est)``, where
    ``n_est = min over j of sketch[j][cell_j(key)]`` — the one-sided CMS
    guarantee means ``n_est >= n_exact``, so no true heavy hitter is
    missed (false positives possible, bounded by sum(n)/w per row).

    The sketch (≤ d·w int rows) collects on the driver and broadcasts
    into a zero-shuffle probe map. Candidate keys here come from an exact
    per-key count (this is the demo/oracle surface — it also yields
    ``n_exact`` for comparison); a true streaming deployment would probe
    its candidate set (e.g. per-batch distinct keys) the same way."""
    from ray.data.aggregate import Count

    sketch_rows = cms_table(ds, key_col, d=d, w=w, seed=seed).take_all()
    sketch: dict[tuple, int] = {(r["j"], r["cell"]): r["n"] for r in sketch_rows}

    keys = ds.select_columns([key_col]).groupby(key_col).aggregate(
        Count(alias_name="n_exact")
    )

    def _probe(batch: pa.Table) -> pa.Table:
        ests = [
            min(sketch.get((j, _u32(f"{seed}:{j}:{key}") % w), 0) for j in range(d))
            for key in batch[key_col].to_pylist()
        ]
        out = batch.append_column("n_est", pa.array(ests, pa.int64()))
        import pyarrow.compute as pc

        return out.filter(pc.greater_equal(out["n_est"], threshold))

    return keys.map_batches(_probe, batch_format="pyarrow")


def histogram_registers(
    ds: ray.data.Dataset,
    value_col: str,
    group_col: str,
    vmin: float,
    width: float,
    nbins: int,
) -> ray.data.Dataset:
    """Fixed-bin mergeable histogram per group: ``(group, bin, n)`` with
    ``bin = min(floor((v - vmin) / width), nbins - 1)`` clamped to
    ``[0, nbins)`` — the bounded-size quantile/distribution sketch
    (mergeable by Sum, the HLL-register discipline: a pure function of the
    value MULTISET, independent of partitioning and cluster size).

    ``vmin``/``width`` are caller-supplied so the bin edges are explicit
    state (compute them once from a cheap min/max pass and reuse across
    snapshots — merging histograms requires identical edges).

    Determinism contract: bin arithmetic is the literal double expression
    ``floor((v - vmin) / width)`` with both constants spliced verbatim
    into the SQL twin (``repr(vmin)``, ``repr(width)``) — never re-derived
    from an aggregate on the oracle side.

    Scale shape: per-batch vectorized combiner emits ≤ ``groups × nbins``
    int rows per batch; a groupby Sum merges. The register table is the
    exact-match oracle surface — every count is an integer."""
    import numpy as np

    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.floor((v - vmin) / width)
        b = np.clip(b, 0, nbins - 1).astype(np.int64)
        df = pd.DataFrame({group_col: batch[group_col].to_pandas(), "bin": b})
        out = df.groupby([group_col, "bin"], sort=False).size().reset_index(name="n")
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        ds.select_columns([group_col, value_col])
        .map_batches(_partial, batch_format="pyarrow")
        .groupby([group_col, "bin"])
        .aggregate(Sum("n", alias_name="n"))
    )


def histogram_quantiles(
    ds: ray.data.Dataset,
    value_col: str,
    group_col: str,
    vmin: float,
    width: float,
    nbins: int,
    quantiles: "list[tuple[int, int]]",
) -> ray.data.Dataset:
    """Approximate per-group quantiles from a :func:`histogram_registers`
    sketch: for each ``(num, den)`` rational quantile, the LOWER EDGE
    ``vmin + bin*width`` of the first bin whose cumulative count reaches
    ``ceil(num*n/den)`` (integer-exact threshold ``(num*n + den - 1) //
    den`` — no float rank arithmetic). Error is bounded by one bin width;
    the EXACT path for small groups is ``diagnostics.group_quantiles``.

    Output: ``(group, q_num, q_den, n, bin, est_value)``. The estimator
    runs per group over its ≤ ``nbins`` register rows (``map_groups`` on
    the bounded sketch table, never the raw values)."""
    import numpy as np
    import pandas as pd

    regs = histogram_registers(ds, value_col, group_col, vmin, width, nbins)

    def _est(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bin")
        cum = g["n"].cumsum().to_numpy()
        total = int(cum[-1])
        rows = []
        for num, den in quantiles:
            thr = (num * total + den - 1) // den
            i = int(np.searchsorted(cum, thr, side="left"))
            b = int(g["bin"].iloc[i])
            rows.append(
                {
                    group_col: g[group_col].iloc[0],
                    "q_num": num,
                    "q_den": den,
                    "n": total,
                    "bin": b,
                    "est_value": vmin + b * width,
                }
            )
        return pd.DataFrame(rows)

    return regs.groupby(group_col).map_groups(_est, batch_format="pandas")


def ams_f2_registers(
    ds: ray.data.Dataset,
    key_col: str,
    group_col: str,
    r: int = 8,
) -> ray.data.Dataset:
    """Per-group AMS "tug-of-war" F2 sketch (Alon, Matias, Szegedy 1996):
    ``r`` independent signed counters per group, one row per
    (group, sketch_idx). Counter j accumulates ``sign_j(key)`` per ROW
    (multiplicities count — the sketch estimates the second frequency
    moment F2 = sum over keys of count^2), where ``sign_j(key)`` is +1
    iff md5-u32("ams:{j}:{key}") is even, else -1.

    Scale shape (same discipline as :func:`hll_registers`): the per-batch
    combiner counts distinct keys first and emits exactly ``r`` partial
    int rows per group per batch; a ``groupby Sum`` merges — signed sums
    are commutative, so the register table is a pure function of the
    multiset of keys, independent of partitioning and cluster size.
    Integer-exact oracle surface; :func:`ams_f2_estimate` is the
    (also integer-derived) estimator over it.
    """
    from collections import Counter

    from ray.data.aggregate import Sum

    sign_cache: dict = {}

    def _signs(key) -> list[int]:
        s = sign_cache.get(key)
        if s is None:
            s = [
                1 if _u32(f"ams:{j}:{key}") % 2 == 0 else -1
                for j in range(r)
            ]
            if len(sign_cache) < 1_000_000:
                sign_cache[key] = s
        return s

    def _partial(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter(
            zip(batch[group_col].to_pylist(), batch[key_col].to_pylist())
        )
        sums: dict = {}
        for (g, key), n in counts.items():
            signs = _signs(key)
            acc = sums.get(g)
            if acc is None:
                acc = sums[g] = [0] * r
            for j in range(r):
                acc[j] += n * signs[j]
        gs, js, ss = [], [], []
        for g, acc in sums.items():
            for j in range(r):
                gs.append(g)
                js.append(j)
                ss.append(acc[j])
        return pa.table(
            {
                group_col: pa.array(gs),
                "sketch_idx": pa.array(js, pa.int64()),
                "s": pa.array(ss, pa.int64()),
            }
        )

    return (
        ds.select_columns([group_col, key_col])
        .map_batches(_partial, batch_format="pyarrow")
        .groupby([group_col, "sketch_idx"])
        .aggregate(Sum("s", alias_name="s"))
    )


def ams_f2_estimate(
    ds: ray.data.Dataset,
    key_col: str,
    group_col: str,
    r: int = 8,
) -> "object":
    """F2 (second frequency moment / self-join size) estimate per group:
    mean of the squared AMS counters. Returns a pandas frame
    ``(group, ss, f2_est)`` where ``ss = sum_j s_j^2`` is the exact-int
    numerator and ``f2_est = ss / r`` the standard estimator
    (E[s_j^2] = F2; variance falls as 1/r). Runs per group over its r
    register rows — the sketch table, never the raw keys."""
    import pandas as pd

    regs = ams_f2_registers(ds, key_col, group_col, r=r).to_pandas()
    out = (
        regs.assign(sq=regs["s"] * regs["s"])
        .groupby(group_col, as_index=False)["sq"]
        .sum()
        .rename(columns={"sq": "ss"})
    )
    out["f2_est"] = out["ss"] / float(r)
    return pd.DataFrame(out).sort_values(group_col).reset_index(drop=True)


def sliding_hll_distinct(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    window_hours: int = 24,
    b: int = 6,
    round_to: int = 6,
) -> ray.data.Dataset:
    """Sliding-window approximate count-distinct — THE mergeable-sketch
    window pattern a 100-TB event stream runs for "distinct users in the
    trailing 24 h, every hour":

      1. one streaming pass builds the per-HOUR HLL register table
         (:func:`hll_registers` grouped by epoch-hour — ≤ 2^b int rows per
         hour, never raw keys);
      2. each register row flat-maps to the ``window_hours`` windows it
         participates in (a pure map over the TINY register table — the
         raw events are touched exactly once, the replication factor
         applies only to hours × 2^b rows);
      3. a (window, bucket) Max merge + per-window estimate.

    Windows are labeled by their END hour; every hour up to the corpus
    max is emitted (early windows cover fewer source hours). All register
    math is integer; the estimator's power sums are sums of exact powers
    of two spanning < 53 bits of exponent range, so they are BIT-EXACT
    and order-independent — the estimate is rounded only against ln()
    libm ulp drift. Output: ``(whour, n_nonzero, sum_rho, max_rho,
    hll_estimate)``."""
    import pandas as pd
    from ray.data.aggregate import Max

    m = 1 << b
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))

    def _hour(batch: pa.Table) -> pa.Table:
        import numpy as np

        us = np.asarray(
            batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64()), dtype=np.int64
        )
        return pa.table(
            {
                key_col: batch[key_col],
                "ehour": pa.array(us // 3_600_000_000, pa.int64()),
            }
        )

    hourly = ds.select_columns([key_col, ts_col]).map_batches(
        _hour, batch_format="pyarrow"
    )
    regs = hll_registers(hourly, key_col, "ehour", b=b).materialize()
    max_hour = regs.max("ehour")

    def _windows(batch: pa.Table) -> pa.Table:
        eh = batch["ehour"].to_pylist()
        bk = batch["bucket"].to_pylist()
        rho = batch["rho"].to_pylist()
        wh, wb, wr = [], [], []
        for e, k, r in zip(eh, bk, rho):
            for o in range(window_hours):
                if e + o <= max_hour:
                    wh.append(e + o)
                    wb.append(k)
                    wr.append(r)
        return pa.table(
            {
                "whour": pa.array(wh, pa.int64()),
                "bucket": pa.array(wb, pa.int64()),
                "rho": pa.array(wr, pa.int64()),
            }
        )

    wregs = (
        regs.map_batches(_windows, batch_format="pyarrow")
        .groupby(["whour", "bucket"])
        .aggregate(Max("rho", alias_name="rho"))
    )

    def _estimate(g: pd.DataFrame) -> pd.DataFrame:
        rho = dict(zip(g["bucket"], g["rho"]))
        # sums of exact powers of two — bit-exact in any order
        s = (m - len(rho)) + sum(2.0 ** -r for r in rho.values())
        raw = alpha * m * m / s
        zeros = m - len(rho)
        if raw <= 2.5 * m and zeros > 0:
            est = m * math.log(m / zeros)
        else:
            est = raw
        return pd.DataFrame(
            {
                "whour": pd.array([int(g["whour"].iloc[0])], dtype="int64"),
                "n_nonzero": pd.array([len(rho)], dtype="int64"),
                "sum_rho": pd.array([int(g["rho"].sum())], dtype="int64"),
                "max_rho": pd.array([int(g["rho"].max())], dtype="int64"),
                "hll_estimate": [round(est, round_to)],
            }
        )

    return wregs.groupby("whour").map_groups(_estimate, batch_format="pandas")
