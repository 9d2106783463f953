"""Property-based tests (hypothesis) for engine primitives.

The reference has no property testing (SURVEY §5); these pin the contracts the
oracle can't efficiently sweep: normalization/shingling laws against a plain
Python reference implementation, as-of join vs a per-key linear scan, NN
forward invariants. Spark round-trips are batched per test (one job over all
generated cases) to keep the suite fast.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), min_size=0, max_size=80
)


def _py_norm(s: str) -> str:
    return re.sub(r"[^a-z0-9]+", " ", s.lower()).strip()


def _py_tokens(s: str) -> list[str]:
    n = _py_norm(s)
    return n.split(" ") if n else [""]  # split on single space: empty text -> ['']


def _py_shingles(s: str, n: int = 3) -> list[str]:
    t = _py_tokens(s)
    if len(t) < n:
        return []
    return [" ".join(t[i : i + n]) for i in range(len(t) - n + 1)]


class TestTextnormProperties:
    @given(st.lists(TEXT, min_size=1, max_size=30))
    @settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
    def test_norm_tokens_shingles_match_python_reference(self, spark, texts):
        from pyspark.sql import functions as F

        from duckdb_ml_spark.operators.textnorm import norm_text, shingles_from_tokens, tokens

        df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
        toked = df.select("i", "t", tokens(F.col("t")).alias("w"))
        rows = toked.select(
            "i",
            norm_text(F.col("t")).alias("norm"),
            "w",
            shingles_from_tokens(F.col("w")).alias("sh"),
        ).collect()
        for r in rows:
            s = texts[r.i]
            assert r.norm == _py_norm(s)
            assert list(r.w) == _py_tokens(s)
            assert list(r.sh) == _py_shingles(s)

    @given(TEXT, TEXT)
    @settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
    def test_norm_idempotent_and_dedup_invariant(self, spark, a, b):
        """norm(norm(x)) == norm(x); texts with equal norms always dedup together."""
        assert _py_norm(_py_norm(a)) == _py_norm(a)
        if _py_norm(a) == _py_norm(b):
            from duckdb_ml_spark.operators.dedup import dedup_exact

            df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
            kept = [r.doc_id for r in dedup_exact(df).collect()]
            assert kept == [1]


class TestAsOfProperties:
    @given(
        st.lists(st.tuples(st.integers(0, 2), st.integers(0, 100)), min_size=1, max_size=25),
        st.lists(st.tuples(st.integers(0, 2), st.integers(0, 100), st.integers(0, 9)), max_size=25),
    )
    @settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
    def test_as_of_join_matches_linear_scan(self, spark, lefts, rights):
        """as_of_join == per-key 'latest right at-or-before, highest val at tie ts'."""
        import datetime as dt

        from duckdb_ml_spark.operators.asof import as_of_join

        base = dt.datetime(2025, 1, 1)
        ts = lambda m: base + dt.timedelta(minutes=m)
        # dedup right to one row per (key, ts) with max val (determinism contract)
        rmap = {}
        for k, m, v in rights:
            rmap[(k, m)] = max(rmap.get((k, m), -1), v)
        left_df = spark.createDataFrame(
            [(i, k, ts(m)) for i, (k, m) in enumerate(lefts)], "i long, k long, ts timestamp"
        )
        right_df = spark.createDataFrame(
            [(k, ts(m), v) for (k, m), v in rmap.items()] or [(99, ts(0), 0)],
            "k long, rts timestamp, val long",
        )
        got = {
            r.i: r.asof_val for r in as_of_join(left_df, right_df, "k", "ts", "rts", ["val"]).collect()
        }
        for i, (k, m) in enumerate(lefts):
            cands = [(rm, v) for (rk, rm), v in rmap.items() if rk == k and rm <= m]
            want = max(cands)[1] if cands else None
            assert got[i] == want, (i, k, m, cands)


class TestMinhashProperties:
    @given(st.lists(TEXT, min_size=1, max_size=10))
    @settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
    def test_signatures_equal_python_min_over_shingle_hashes(self, spark, texts):
        """mh_i == min over the doc's shingles of (a_i·h + b_i) mod p, where
        h = low-60-bits(md5(shingle)) mod p (None when no shingles) — the
        permutation-min law of the one-md5 affine minhash family."""
        import hashlib

        from duckdb_ml_spark.operators.dedup import (
            MINHASH_COEF,
            MINHASH_K,
            MINHASH_P,
            minhash_signatures,
        )

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = {r.doc_id: r for r in minhash_signatures(df).collect()}
        h60 = lambda s: int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % MINHASH_P
        for i, t in enumerate(texts):
            sh = _py_shingles(t)
            if not sh:
                assert i not in got  # no shingles -> no signature row
                continue
            hs = [h60(s) for s in sh]
            for k in range(MINHASH_K):
                a, b = MINHASH_COEF[k]
                want = min((a * h + b) % MINHASH_P for h in hs)
                assert got[i][f"mh{k:02d}"] == want


class TestNNProperties:
    @given(st.integers(1, 16), st.integers(1, 8), st.integers(1, 4))
    @settings(max_examples=20, deadline=None)
    def test_forward_shape_and_finiteness(self, batch, in_dim, out_dim):
        import numpy as np

        from duckdb_ml_spark import nn

        spec = nn.parse_spec(
            '{"layers": [{"in": %d, "out": 8, "activation": "relu"}, {"in": 8, "out": %d}]}'
            % (in_dim, out_dim)
        )
        params = nn.init_params(spec, seed=1)
        x = np.random.default_rng(0).normal(size=(batch, in_dim)).astype(np.float32)
        out, _ = nn.forward(spec, params, x, training=False)
        assert out.shape == (batch, out_dim)
        assert np.isfinite(out).all()


class TestPngProperties:
    @given(
        st.integers(1, 12),
        st.integers(1, 12),
        st.sampled_from([1, 3, 4]),
        st.integers(0, 4),
        st.integers(0, 2**32 - 1),
    )
    @settings(max_examples=60, deadline=None)
    def test_roundtrip_any_shape_any_filter(self, h, w, ch, ft, seed):
        """encode→decode is the identity for every image shape, channel
        count, and scanline filter type."""
        import numpy as np

        from duckdb_ml_spark.operators.png import png_decode, png_encode

        rng = np.random.default_rng(seed)
        shape = (h, w) if ch == 1 else (h, w, ch)
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        assert np.array_equal(png_decode(png_encode(img, ft)), img)

    @given(st.integers(1, 9), st.integers(1, 9), st.integers(1, 6), st.integers(1, 6))
    @settings(max_examples=40, deadline=None)
    def test_resize_mean_bounds_and_identity(self, h, w, oh, ow):
        """Adaptive mean-pool output stays within [min, max] of the input and
        is exact identity when shapes match."""
        import numpy as np

        from duckdb_ml_spark.operators.png import resize_mean

        rng = np.random.default_rng(h * 100 + w * 10 + oh + ow)
        g = rng.uniform(0, 255, size=(h, w))
        r = resize_mean(g, oh, ow)
        assert r.shape == (oh, ow)
        assert r.min() >= g.min() - 1e-9 and r.max() <= g.max() + 1e-9
        if (oh, ow) == (h, w):
            assert np.array_equal(r, g)


def test_chunk_stride_property_random(spark):
    """Hypothesis: chunk layout matches the closed-form reference for random
    token counts — full coverage, fixed overlap, shorter tail."""
    from hypothesis import given, settings, strategies as st

    from duckdb_ml_spark.operators.text import chunk_stride

    W, S = 7, 5  # small window/stride to hit many boundary cases

    @settings(max_examples=8, deadline=None)
    @given(st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=12))
    def run(lens):
        docs = spark.createDataFrame(
            [(i, " ".join(f"t{i}x{j}" for j in range(n))) for i, n in enumerate(lens)],
            "doc_id bigint, text string",
        )
        rows = chunk_stride(docs, window=W, stride=S).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r)
        for i, n in enumerate(lens):
            rs = sorted(by_doc[i], key=lambda r: r.chunk_id)
            expected = 1 + max(0, -(-(n - W) // S)) if n > W else 1
            assert len(rs) == expected, (n, len(rs))
            covered = set()
            for r in rs:
                assert r.tok_start == r.chunk_id * S
                assert r.n_chunk_tokens == min(W, n - r.tok_start)
                assert len(r.chunk_text.split(" ")) == r.n_chunk_tokens
                covered.update(range(r.tok_start, r.tok_start + r.n_chunk_tokens))
            assert covered == set(range(n))

    run()
