"""Property-based tests (hypothesis) for the algorithmic cores, plus
PCA correctness vs NumPy."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from bfr_clustering_using_pyspark_spark.ml.bfr import Summaries, mahalanobis_to_all
from bfr_clustering_using_pyspark_spark.ml.metrics import nmi_from_contingency


@st.composite
def point_sets(draw, max_n=60, d=4):
    n = draw(st.integers(2, max_n))
    vals = draw(
        st.lists(
            st.floats(-100, 100, allow_nan=False, width=32), min_size=n * d, max_size=n * d
        )
    )
    return np.array(vals, dtype=np.float64).reshape(n, d)


class TestSummariesProperties:
    @given(point_sets(), st.integers(2, 5))
    @settings(max_examples=40, deadline=None)
    def test_merge_associativity(self, pts, k):
        """Folding partials in any grouping gives identical stats —
        the property that makes map-side partial aggregation valid."""
        labels = (np.arange(len(pts)) * 7) % k
        whole = Summaries.from_points(pts, labels, k)
        half = len(pts) // 2
        s1 = Summaries.from_points(pts[:half], labels[:half], k)
        s2 = Summaries.from_points(pts[half:], labels[half:], k)
        s1.counts += s2.counts
        s1.sums += s2.sums
        s1.sqsums += s2.sqsums
        assert np.array_equal(whole.counts, s1.counts)
        assert np.allclose(whole.sums, s1.sums, atol=1e-6)
        assert np.allclose(whole.sqsums, s1.sqsums, atol=1e-4)

    @given(point_sets())
    @settings(max_examples=40, deadline=None)
    def test_stds_nonnegative_and_centered(self, pts):
        s = Summaries.from_points(pts, np.zeros(len(pts), dtype=int), 1)
        assert (s.stds >= 0).all()
        assert np.allclose(s.centers[0], pts.mean(axis=0), rtol=1e-9, atol=1e-6)

    @given(point_sets())
    @settings(max_examples=30, deadline=None)
    def test_mahalanobis_self_distance_zero(self, pts):
        s = Summaries.from_points(pts, np.zeros(len(pts), dtype=int), 1)
        d = mahalanobis_to_all(s.centers, s.centers, s.stds)
        assert abs(d[0, 0]) < 1e-9


class TestNMIProperties:
    @given(st.integers(2, 8), st.integers(50, 300))
    @settings(max_examples=30, deadline=None)
    def test_permutation_invariance(self, k, n):
        """NMI is invariant to relabeling either side."""
        rng = np.random.default_rng(n)
        a = rng.integers(0, k, n)
        b = rng.integers(0, k, n)
        perm = rng.permutation(k)
        cont = lambda x, y: (  # noqa: E731
            pd.DataFrame({"pred": x, "truth": y}).groupby(["pred", "truth"]).size().reset_index(name="n")
        )
        assert abs(nmi_from_contingency(cont(a, b)) - nmi_from_contingency(cont(perm[a], b))) < 1e-12

    @given(st.integers(2, 8), st.integers(50, 300))
    @settings(max_examples=30, deadline=None)
    def test_bounds(self, k, n):
        rng = np.random.default_rng(n + 1)
        a = rng.integers(0, k, n)
        b = rng.integers(0, k, n)
        cont = pd.DataFrame({"pred": a, "truth": b}).groupby(["pred", "truth"]).size().reset_index(name="n")
        v = nmi_from_contingency(cont)
        assert -1e-12 <= v <= 1 + 1e-12


class TestPCA:
    def test_matches_numpy_pca(self, spark):
        from bfr_clustering_using_pyspark_spark.operators.embeddings_ops import pca_project
        from tests.conftest import SF_SMALL

        out = pca_project(spark, SF_SMALL, n_components=4)
        proj = np.stack(out.toPandas().sort_values("vec_id")["pc"].to_numpy())

        emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").toPandas().sort_values("vec_id")
        X = np.stack(emb["embedding"].map(np.asarray).to_numpy()).astype(np.float64)
        Xc = X - X.mean(axis=0)
        _, _, vt = np.linalg.svd(Xc, full_matrices=False)
        ref = Xc @ vt[:4].T
        # components are sign/rotation-ambiguous only up to sign here
        for j in range(4):
            assert min(
                np.abs(proj[:, j] - ref[:, j]).max(), np.abs(proj[:, j] + ref[:, j]).max()
            ) < 1e-3
        # projected variance decreasing
        var = proj.var(axis=0)
        assert all(var[i] >= var[i + 1] - 1e-9 for i in range(3))
        # explained-variance introspection survives on the returned DF
        # and matches the projected variance per component
        ev = out._pca_explained_variance
        assert len(ev) == 4
        np.testing.assert_allclose(ev, var, rtol=1e-3, atol=1e-6)

    def test_power_det_matches_integer_replay_and_true_pc1(self, spark):
        """pca_power_det must (a) equal a NumPy replay of the exact
        integer matrix-squaring algorithm bit-for-bit, and (b) point
        within machine cosine of the true top eigenvector — the
        determinism is not bought with a wrong direction."""
        from bfr_clustering_using_pyspark_spark.operators.embeddings_ops import (
            PCA_M_DIV,
            PCA_M_NORM,
            PCA_SCALE,
            PCA_SQUARINGS,
            _pca_v0,
            pca_power_det,
        )
        from tests.conftest import SF_SMALL

        got = {
            r["vec_id"]: r["pc1_q"]
            for r in pca_power_det(spark, SF_SMALL).collect()
        }

        # Spark F.round / DuckDB round() are HALF AWAY FROM ZERO;
        # np.round is banker's — replay with the engines' rule.
        def r(a):
            return (np.sign(a) * np.floor(np.abs(a) + 0.5)).astype(np.int64)

        emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").toPandas()
        emb = emb.sort_values("vec_id")
        X = np.stack(emb["embedding"].map(np.asarray).to_numpy()).astype(np.float64)
        xq = r(X * PCA_SCALE)
        mu = r(xq.sum(axis=0).astype(np.float64) / len(xq))
        c = xq - mu
        m = r((c.T @ c).astype(np.float64) / PCA_M_DIV)
        m = r(m.astype(np.float64) * PCA_M_NORM / max(np.abs(m).max(), 1))
        for _ in range(PCA_SQUARINGS):
            sq = m @ m  # exact in int64: |entries| <= 64 * 1e16 < 2^63
            m = r(sq.astype(np.float64) * PCA_M_NORM / max(np.abs(sq).max(), 1))
        v0 = np.array(_pca_v0(), dtype=np.int64)
        w = m @ v0
        v = r(w.astype(np.float64) * PCA_SCALE / max(np.abs(w).max(), 1))
        want = dict(zip(emb["vec_id"].to_numpy(), (c @ v).tolist()))
        assert got == want

        # direction check vs eigh's top component (sign-insensitive)
        cov = np.cov(X, rowvar=False)
        eigvals, eigvecs = np.linalg.eigh(cov)
        top = eigvecs[:, np.argmax(eigvals)]
        cos = abs(top @ v / (np.linalg.norm(top) * np.linalg.norm(v)))
        assert cos > 0.9998, cos

    def test_power_det_cross_engine_fuzz(self, spark, tmp_path):
        """Spark face == DuckDB oracle BIT-FOR-BIT on seeded random
        corpora (different n, anisotropy, near-tie magnitudes) — the
        determinism claim must not hinge on the shipped table's
        particular values."""
        import duckdb
        import pandas as pd

        from bfr_clustering_using_pyspark_spark.operators.embeddings_ops import (
            PCA_POWER_DET_SQL,
            pca_power_det,
        )

        for seed, n, scale in ((1, 37, 1.0), (2, 80, 1e-3), (3, 150, 0.999)):
            rng = np.random.default_rng(seed)
            # anisotropic gaussian squashed into (-1, 1); tiny scale
            # stresses the quantizer near its rounding granularity
            X = np.tanh(rng.normal(size=(n, 64)) @ np.diag(rng.uniform(0.2, 1, 64))) * scale
            pdf = pd.DataFrame(
                {"vec_id": range(n), "embedding": [row.astype(np.float32) for row in X]}
            )
            d = tmp_path / f"fuzz{seed}"
            d.mkdir()
            spark.createDataFrame(pdf).write.parquet(str(d / "embeddings.parquet"))

            got = [
                (r["vec_id"], r["pc1_q"])
                for r in pca_power_det(spark, str(d)).collect()
            ]
            con = duckdb.connect()
            con.execute(
                f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{d}/embeddings.parquet/*.parquet')"
            )
            want = [(r[0], r[1]) for r in con.execute(PCA_POWER_DET_SQL).fetchall()]
            assert got == want, f"seed={seed}: first diff {[p for p in zip(got, want) if p[0] != p[1]][:3]}"


def test_pca_power_det_degenerate_corpora_symmetric(spark, tmp_path):
    """Contract symmetry on malformed corpora (ADVICE r7): empty
    table → BOTH faces return an empty (vec_id, pc1_q) result;
    short embeddings → BOTH faces raise."""
    import duckdb
    import pandas as pd

    from bfr_clustering_using_pyspark_spark.operators.embeddings_ops import (
        PCA_POWER_DET_SQL,
        pca_power_det,
    )

    # empty corpus
    d = tmp_path / "empty"
    d.mkdir()
    pdf = pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                        "embedding": pd.Series([], dtype="object")})
    spark.createDataFrame(pdf, "vec_id long, embedding array<float>").write.parquet(
        str(d / "embeddings.parquet")
    )
    out = pca_power_det(spark, str(d))
    assert out.columns == ["vec_id", "pc1_q"]
    assert out.count() == 0
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{d}/embeddings.parquet/*.parquet')"
    )
    assert con.execute(PCA_POWER_DET_SQL).fetchall() == []

    # short (non-64-dim) corpus: both faces fail fast
    d2 = tmp_path / "short"
    d2.mkdir()
    pdf2 = pd.DataFrame({"vec_id": [0, 1],
                         "embedding": [np.ones(8, dtype=np.float32)] * 2})
    spark.createDataFrame(pdf2).write.parquet(str(d2 / "embeddings.parquet"))
    import pytest

    with pytest.raises(ValueError, match="64-dim"):
        pca_power_det(spark, str(d2))
    con2 = duckdb.connect()
    con2.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{d2}/embeddings.parquet/*.parquet')"
    )
    with pytest.raises(Exception, match="64-dim"):
        con2.execute(PCA_POWER_DET_SQL).fetchall()


def test_dedup_substring_equals_lcs_bruteforce(spark, tmp_path):
    """On random small-alphabet corpora (repetition-heavy, so shared
    runs and repeated shingles abound), the diagonal-islands result
    must equal the brute-force longest-common-substring DP:
    max_run_shingles == LCS_tokens - K + 1 for every pair with
    LCS >= MIN_RUN + K - 1, and no other pair reported."""
    import random

    from bfr_clustering_using_pyspark_spark.operators.dedup import (
        SUBSTR_K,
        SUBSTR_MIN_RUN,
        dedup_substring,
    )

    def lcs_tokens(a, b):
        best, prev = 0, [0] * (len(b) + 1)
        for i in range(1, len(a) + 1):
            cur = [0] * (len(b) + 1)
            for j in range(1, len(b) + 1):
                if a[i - 1] == b[j - 1]:
                    cur[j] = prev[j - 1] + 1
                    best = max(best, cur[j])
            prev = cur
        return best

    rng = random.Random(42)
    for trial in range(3):
        docs = []
        shared = [rng.choice("abc") + str(i) for i in range(20)]
        for d in range(8):
            toks = [rng.choice("ab") + str(rng.randrange(6)) for _ in range(30)]
            if d % 3 == 0:  # plant the shared run in some docs
                at = rng.randrange(10)
                toks[at : at + 20] = shared
            docs.append((d, " ".join(toks)))
        pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
        pdf["lang"], pdf["source"] = "en", "t"
        pdf["n_chars"] = pdf["text"].str.len()
        pdf.to_parquet(f"{tmp_path}/documents.parquet", index=False)

        got = {
            (r["doc_a"], r["doc_b"]): r["max_run_shingles"]
            for r in dedup_substring(spark, str(tmp_path)).collect()
        }
        toks = {d: t.split(" ") for d, t in docs}
        want = {}
        for a in range(8):
            for b in range(a + 1, 8):
                run = lcs_tokens(toks[a], toks[b]) - SUBSTR_K + 1
                if run >= SUBSTR_MIN_RUN:
                    want[(a, b)] = run
        assert got == want, f"trial {trial}: {got} != {want}"
