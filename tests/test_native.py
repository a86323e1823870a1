"""Native data-pipeline library (C++ via ctypes) and its Python fallback."""
import os
import tempfile

import numpy as np
import pytest

from recsys_tpu.data import native


def test_negative_sampling_excludes_positives():
    excl = [[1, 2, 3], [4, 5], []]
    neg = native.sample_negatives(excl, 50, 0, 10, seed=3)
    assert neg.shape == (3, 50)
    assert not set(neg[0].tolist()) & {1, 2, 3}
    assert not set(neg[1].tolist()) & {4, 5}
    assert neg.min() >= 0 and neg.max() < 10


def test_shuffle_is_permutation_and_deterministic():
    a = native.shuffle_indices(1000, seed=42)
    b = native.shuffle_indices(1000, seed=42)
    c = native.shuffle_indices(1000, seed=43)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    np.testing.assert_array_equal(np.sort(a), np.arange(1000))


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_parse_criteo_native():
    rows = [
        "label," + ",".join(f"I{i}" for i in range(1, 14)) + ","
        + ",".join(f"C{i}" for i in range(1, 27))
    ]
    rng = np.random.default_rng(0)
    n = 500
    want_labels, want_d0 = [], []
    for _ in range(n):
        label = int(rng.integers(0, 2))
        dense = [str(int(rng.integers(0, 100))) for _ in range(13)]
        cats = [f"v{int(rng.integers(0, 50))}" for _ in range(26)]
        want_labels.append(label)
        want_d0.append(float(dense[0]))
        rows.append(",".join([str(label)] + dense + cats))
    # a missing-value row
    rows.append("1," + "," * 12 + "," + "," * 25)
    path = os.path.join(tempfile.mkdtemp(), "criteo.csv")
    with open(path, "w") as f:
        f.write("\n".join(rows) + "\n")
    labels, dense, sparse = native.parse_criteo(path, cat_buckets=1 << 12)
    assert len(labels) == n + 1
    np.testing.assert_array_equal(labels[:n], want_labels)
    np.testing.assert_allclose(dense[:n, 0], want_d0)
    assert labels[n] == 1.0 and dense[n].sum() == 0.0
    assert sparse.min() >= 0 and sparse.max() < (1 << 12)
    # identical tokens hash identically across columns
    assert len(np.unique(sparse)) < 60 * 26


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_criteo_tsv_headerless_autodetect():
    """Full-size criteo format: tab-separated, no header."""
    from recsys_tpu.data.criteo import create_criteo_dataset

    rng = np.random.default_rng(1)
    rows = []
    for i in range(200):
        dense = [str(int(rng.integers(0, 50))) for _ in range(13)]
        cats = [f"{int(rng.integers(0, 99)):08x}" for _ in range(26)]
        rows.append("\t".join([str(int(rng.integers(0, 2)))] + dense + cats))
    path = os.path.join(tempfile.mkdtemp(), "train.txt")
    with open(path, "w") as f:
        f.write("\n".join(rows) + "\n")
    schema, train, test = create_criteo_dataset(
        path, use_native=True, hash_buckets=1 << 10, embed_dim=4
    )
    assert len(train["label"]) + len(test["label"]) == 200
    assert train["sparse"].max() < (1 << 10)
    assert 0.0 <= train["dense"].min() and train["dense"].max() <= 1.0


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_criteo_rejects_garbage_file():
    from recsys_tpu.data.criteo import create_criteo_dataset

    path = os.path.join(tempfile.mkdtemp(), "bad.csv")
    with open(path, "w") as f:
        f.write("label,stuff\n1,2\n")
    with pytest.raises(ValueError, match="no valid rows"):
        create_criteo_dataset(path, use_native=True)


def test_native_seq_leave_last2_matches_python_structure():
    """Native SASRec builder: deterministic fields (hist/pos/splits) match
    the Python builder exactly; negatives obey the exclusion invariant."""
    import numpy as np
    import pandas as pd
    import pytest

    from recsys_tpu.data import native
    from recsys_tpu.data.movielens import build_sasrec_dataset

    if not native.available():
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(0)
    n = 3000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 120, n),
        "item_id": rng.integers(0, 300, n),
        "timestamp": rng.integers(0, 10_000, n),
        "rating": np.ones(n),
    })
    for all_pos in (False, True):
        ni_p, tr_p, va_p, te_p = build_sasrec_dataset(
            df, maxlen=12, test_neg_num=5, min_item_count=2, seed=7,
            all_positions=all_pos, use_native=False)
        ni_n, tr_n, va_n, te_n = build_sasrec_dataset(
            df, maxlen=12, test_neg_num=5, min_item_count=2, seed=7,
            all_positions=all_pos, use_native=True)
        assert ni_p == ni_n
        for a, b in [(tr_p, tr_n), (va_p, va_n), (te_p, te_n)]:
            np.testing.assert_array_equal(a["hist"], b["hist"])
            np.testing.assert_array_equal(a["pos"], b["pos"])
            assert a["neg"].shape == b["neg"].shape
        # negatives: in range, never in the user's history row
        for split in (tr_n, va_n, te_n):
            negs = split["neg"]
            real = negs[negs != 0] if all_pos else negs
            assert real.min() >= 1 and real.max() < ni_n
        for i in range(len(te_n["hist"])):
            hist_set = set(te_n["hist"][i]) | {int(te_n["pos"][i])}
            assert not (set(te_n["neg"][i].tolist()) & hist_set)


def test_native_seq_builder_rejects_when_unavailable(monkeypatch):
    import pandas as pd
    import numpy as np
    import pytest

    from recsys_tpu.data import native as native_mod
    from recsys_tpu.data.movielens import build_sasrec_dataset

    monkeypatch.setattr(native_mod, "_load", lambda: None)
    monkeypatch.setattr(native_mod, "_lib", None, raising=False)
    df = pd.DataFrame({
        "user_id": [0] * 5, "item_id": np.arange(5),
        "timestamp": np.arange(5), "rating": np.ones(5),
    })
    with pytest.raises(RuntimeError, match="native"):
        build_sasrec_dataset(df, min_item_count=1, use_native=True)
