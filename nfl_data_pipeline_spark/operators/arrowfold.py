"""Exact-order Arrow kernels for the engine's interpreted folds.

Spark evaluates higher-order functions (``aggregate``/``transform``
lambdas) in the interpreted expression evaluator — no whole-stage
codegen — so each array element costs an interpreter dispatch. The
kernels here compute THE SAME left-to-right folds, vectorized ACROSS
ROWS in numpy: the Python loop runs over fold STEPS (array positions /
permutations), and each step applies one scalar op to every row's
accumulator at once.

Bit-identity argument (what lets ORACLE-GATED queries use these):

- per row, the op sequence is exactly the SQL fold's — step ``j``
  performs the same multiply/add on the same operands in the same
  order;
- float64 add/mul/sub are single correctly-rounded IEEE-754 ops on
  both the JVM and numpy (SSE2 doubles, no x87 extended precision),
  so identical operand sequences give identical bits;
- int64 ops wrap identically, and every integer fold here stays in
  range anyway (operands < P² + P < 2⁶³ for the MinHash fold).

np.dot / einsum / matmul are deliberately NOT used: BLAS reorders
summation (pairwise, SIMD lanes), which drifts from the sequential
fold at the last ulp — the measured reason cosine_topk's fast path is
documented as set-identical, not bit-identical. These kernels are
bit-identical, which is a stronger contract than that fast path's.

NULL semantics mirror the SQL expressions they replace; each kernel's
docstring states the mapping it reproduces.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nfl_data_pipeline_spark.operators.hashing import P


def _np():
    import numpy as np

    return np


def minhash_signature_arrow(
    df_sids: DataFrame, perms: list[tuple[int, int]], sids_col: str = "sids"
) -> DataFrame:
    """``with_minhash_signature`` computed in one Arrow pass: adds
    ``mh0..mhK-1`` where ``mh_i = array_min(transform(sids, x ->
    (a_i*x + b_i) % P))``.

    Per batch the flattened sid values are hashed with ONE vectorized
    ``(a*x + b) % P`` per permutation and segment-minimized with
    ``np.minimum.reduceat`` — a pure min over a set, so evaluation
    order is irrelevant and int64 arithmetic is exact (see module
    docstring for the range argument).

    NULL mapping: an empty or NULL ``sids`` array makes every
    ``array_min`` NULL in SQL; here those rows get a NULL signature
    array, and element extraction yields the same per-column NULLs.
    """
    np = _np()
    a_vec = [int(a) for a, _ in perms]
    b_vec = [int(b) for _, b in perms]
    k = len(perms)

    @F.pandas_udf("array<bigint>")
    def _sig(sids):
        import pandas as pd

        n = len(sids)
        if n == 0:
            return pd.Series([], dtype=object)
        lens = np.fromiter(
            (0 if v is None else len(v) for v in sids), np.int64, count=n
        )
        good = lens > 0
        out = np.empty(n, dtype=object)
        out[~good] = None
        if good.any():
            arrs = [
                np.asarray(v, dtype=np.int64)
                for v, g in zip(sids, good)
                if g
            ]
            flat = np.concatenate(arrs)
            glens = lens[good]
            starts = np.zeros(len(arrs), dtype=np.int64)
            np.cumsum(glens[:-1], out=starts[1:])
            mins = np.empty((len(arrs), k), dtype=np.int64)
            for i in range(k):
                h = (a_vec[i] * flat + b_vec[i]) % P
                mins[:, i] = np.minimum.reduceat(h, starts)
            for pos, row in zip(np.flatnonzero(good), mins):
                out[pos] = row
        return pd.Series(out)

    sig = df_sids.withColumn("_mhsig", _sig(F.col(sids_col)))
    for i in range(k):
        sig = sig.withColumn(f"mh{i}", F.col("_mhsig").getItem(i))
    return sig.drop("_mhsig")


def shingle_sids_udf(n: int = 3):
    """``with_shingle_ids``'s text → distinct-shingle-id column as one
    Arrow kernel — the rolling hash was the measured dominant executor
    cost of the near-dup gate's signature block (per-CHARACTER
    interpreted fold steps; see OPTIMIZATION_r13.md).

    Replicates the SQL pipeline exactly (semantics pinned empirically,
    tools/arrowfold_equiv.py):

    - ``split(text, ' ')`` keeps interior AND trailing empty tokens —
      Python ``str.split(' ')`` matches;
    - token hash ``h = fold chars: (h*31 + codepoint) % P`` with h=0
      start; Spark's ``split(t, '')`` on an EMPTY token yields [''],
      and ``ascii('') = 0`` so the fold gives (0*31+0)%P = 0 — equal
      to the kernel's empty-fold 0;
    - < n tokens → empty array; NULL text → empty array (size(NULL)
      comparison falls through to the THEN array() branch);
    - shingle id = Horner compose of n consecutive token hashes
      (operands < A·P + P < 2⁶³ — exact int64);
    - ``array_distinct`` keeps first-occurrence order — ``pd.unique``
      matches.

    Codepoints come from a single ``utf-32-le`` encode of the batch's
    concatenated tokens (one C-level pass), the per-token Horner runs
    masked over char positions, and shingle composition is one
    vectorized expression over the flat token-hash array.
    """
    np = _np()
    from nfl_data_pipeline_spark.operators.hashing import A

    @F.pandas_udf("array<bigint>")
    def _sids(texts):
        import pandas as pd

        n_rows = len(texts)
        if n_rows == 0:
            return pd.Series([], dtype=object)
        tok_lists = [
            [] if t is None else t.split(" ") for t in texts
        ]
        doc_ntok = np.fromiter(
            (len(tl) for tl in tok_lists), np.int64, count=n_rows
        )
        flat_tokens = [t for tl in tok_lists for t in tl]
        T = len(flat_tokens)
        out = np.empty(n_rows, dtype=object)
        empty = np.array([], dtype=np.int64)
        if T == 0:
            out[:] = [empty] * n_rows
            return pd.Series(out)
        tok_lens = np.fromiter(
            (len(t) for t in flat_tokens), np.int64, count=T
        )
        starts = np.zeros(T, dtype=np.int64)
        np.cumsum(tok_lens[:-1], out=starts[1:])
        cp = np.frombuffer(
            "".join(flat_tokens).encode("utf-32-le"), dtype=np.uint32
        ).astype(np.int64)
        th = np.zeros(T, dtype=np.int64)
        max_len = int(tok_lens.max()) if T else 0
        live = np.arange(T)
        for j in range(max_len):
            live = live[tok_lens[live] > j]
            if live.size == 0:
                break
            th[live] = (th[live] * 31 + cp[starts[live] + j]) % P
        # Horner-compose n consecutive token hashes over the flat
        # array; per-doc slices come from the doc token offsets.
        if T >= n:
            sid_flat = th[: T - n + 1].copy()
            for k in range(1, n):
                sid_flat = (sid_flat * A + th[k : T - n + 1 + k]) % P
        else:
            sid_flat = empty
        doc_starts = np.zeros(n_rows, dtype=np.int64)
        np.cumsum(doc_ntok[:-1], out=doc_starts[1:])
        for i in range(n_rows):
            w = doc_ntok[i] - n + 1
            if w <= 0:
                out[i] = empty
            else:
                s = doc_starts[i]
                out[i] = pd.unique(sid_flat[s : s + w])
        return pd.Series(out)

    return _sids


def exact_fold_dot(a_col: str, b_col: str) -> Column:
    """``sp_dot(a, b)`` (the lambda fold — ``aggregate(zip_with(a, b,
    (x, y) -> x*y), 0.0, (s, v) -> s + v)``) as an Arrow kernel: the
    per-dimension loop adds ``A[:, j] * B[:, j]`` into the accumulator
    column, which is per row exactly ``((0.0 + a0*b0) + a1*b1) + ...``
    — the same left-associated IEEE sequence, so bit-identical.

    NULL mapping: NULL on either side, or length mismatch (zip_with
    pads with NULL → NULL product → NULL sum), makes the SQL fold
    NULL; those rows return NULL here too.
    """
    np = _np()

    @F.pandas_udf("double")
    def _dot(av, bv):
        import pandas as pd

        n = len(av)
        if n == 0:
            return pd.Series([], dtype="float64")
        out = np.full(n, np.nan)
        key = {}
        for idx in range(n):
            x, y = av.iloc[idx], bv.iloc[idx]
            if x is None or y is None or len(x) != len(y):
                continue
            key.setdefault(len(x), []).append(idx)
        for d, idxs in key.items():
            ii = np.asarray(idxs)
            if d == 0:
                out[ii] = 0.0
                continue
            A = np.stack([np.asarray(av.iloc[i], dtype=np.float64) for i in idxs])
            B = np.stack([np.asarray(bv.iloc[i], dtype=np.float64) for i in idxs])
            acc = np.zeros(len(idxs))
            for j in range(d):
                acc += A[:, j] * B[:, j]
            out[ii] = acc
        # NaN → NULL through the Arrow mask, matching the SQL NULLs;
        # finite inputs cannot produce a genuine NaN dot.
        return pd.Series(out)

    return _dot(F.col(a_col), F.col(b_col))


def exact_band_vals_udf(spark, band_bits: int, n_bands: int, dim: int):
    """The hyperplane band projector as an exact-order Arrow kernel:
    returns a pandas_udf computing ``_hbs`` (array of ``n_bands`` band
    values) bit-identically to the SQL ``_hyperplane_proj`` path —
    unlike the matmul engine, whose BLAS summation can flip a
    near-zero projection's sign.

    Projection fold per plane ``p``: ``s_j = s_{j-1} + vec[j] *
    w(p, j)`` — reproduced by the per-dimension loop
    ``acc[:, p] += V[:, j] * W[j, p]`` (one IEEE multiply-add pair per
    step per row, same order). Weights come from
    :func:`plane_matrix`, i.e. Spark's own ``hash`` — identical bits
    by construction.

    NULL mapping: a NULL or wrong-length vector makes every
    projection NULL in SQL (``element_at`` past the end), and
    ``CASE WHEN NULL > 0`` takes the ELSE branch — every band value
    0. Those rows get all-zero band values here too.
    """
    np = _np()
    from nfl_data_pipeline_spark.operators.similarity import plane_matrix

    mat = plane_matrix(spark, n_bands * band_bits, dim)
    bc = spark.sparkContext.broadcast(mat)
    n_planes = n_bands * band_bits

    @F.pandas_udf("array<long>")
    def _band_vals(vecs):
        import pandas as pd

        n = len(vecs)
        if n == 0:
            return pd.Series([], dtype=object)
        W = bc.value
        good_idx = [
            i
            for i in range(n)
            if vecs.iloc[i] is not None and len(vecs.iloc[i]) == dim
        ]
        vals = np.zeros((n, n_bands), dtype=np.int64)
        if good_idx:
            V = np.stack(
                [np.asarray(vecs.iloc[i], dtype=np.float64) for i in good_idx]
            )
            acc = np.zeros((len(good_idx), n_planes))
            for j in range(dim):
                acc += V[:, j : j + 1] * W[j : j + 1, :]
            bits = acc > 0
            weights = 1 << np.arange(band_bits, dtype=np.int64)
            gv = np.stack(
                [
                    bits[:, b * band_bits : (b + 1) * band_bits] @ weights
                    for b in range(n_bands)
                ],
                axis=1,
            )
            vals[np.asarray(good_idx)] = gv
        return pd.Series(list(vals))

    return _band_vals
