import numpy as np
import pytest

from fact_clip_tpu.data import native
from fact_clip_tpu.utils.segments import parse_label, shrink_frame_label

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib not built")


def test_npy_dims(tmp_path, rng):
    p = str(tmp_path / "a.npy")
    np.save(p, rng.normal(size=(37, 12)).astype(np.float32))
    assert native.npy_dims(p) == (37, 12)


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
@pytest.mark.parametrize("transpose", [False, True])
def test_load_features_matches_numpy(tmp_path, rng, dtype, transpose):
    arr = rng.normal(size=(20, 8)).astype(dtype)  # stored as (D, T) if transpose
    p = str(tmp_path / f"f_{dtype.__name__}_{transpose}.npy")
    np.save(p, arr)
    expected = (arr.T if transpose else arr).astype(np.float32)
    out = native.load_features(p, transpose, t_cap=1000, d=expected.shape[1])
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_load_features_fortran_order(tmp_path, rng):
    arr = np.asfortranarray(rng.normal(size=(15, 6)).astype(np.float32))
    p = str(tmp_path / "fortran.npy")
    np.save(p, arr)
    out = native.load_features(p, False, t_cap=100, d=6)
    np.testing.assert_allclose(out, arr, rtol=1e-6)


def test_load_features_t_cap(tmp_path, rng):
    arr = rng.normal(size=(50, 4)).astype(np.float32)
    p = str(tmp_path / "cap.npy")
    np.save(p, arr)
    out = native.load_features(p, False, t_cap=30, d=4)
    assert out.shape == (30, 4)
    np.testing.assert_allclose(out, arr[:30], rtol=1e-6)


def test_load_features_dim_mismatch(tmp_path, rng):
    p = str(tmp_path / "bad.npy")
    np.save(p, rng.normal(size=(10, 4)).astype(np.float32))
    with pytest.raises(IOError):
        native.load_features(p, False, t_cap=10, d=99)


def test_shrink_labels_matches_python(rng):
    for _ in range(20):
        n = int(rng.integers(1, 200))
        clip = int(rng.integers(1, 12))
        labels = rng.integers(0, 5, size=n)
        ours = native.shrink_labels(labels, clip)
        ref = shrink_frame_label(list(labels), clip)
        np.testing.assert_array_equal(ours, ref)


def test_rle_matches_parse_label(rng):
    labels = rng.integers(0, 3, size=60)
    cls, start, end = native.rle(labels)
    segs = parse_label(labels)
    assert len(cls) == len(segs)
    for i, s in enumerate(segs):
        assert (cls[i], start[i], end[i]) == (s.action, s.start, s.end)


def test_assemble_batch_parallel(tmp_path, rng):
    D, t_cap = 6, 64
    paths, refs = [], []
    for i in range(5):
        t = int(rng.integers(10, 60))
        arr = rng.normal(size=(D, t)).astype(np.float32)  # stored transposed
        p = str(tmp_path / f"v{i}.npy")
        np.save(p, arr)
        paths.append(p)
        refs.append(arr.T)
    batch, lengths = native.assemble_batch(paths, transpose=True, t_cap=t_cap, d=D)
    assert batch.shape == (5, t_cap, D)
    for i, r in enumerate(refs):
        assert lengths[i] == len(r)
        np.testing.assert_allclose(batch[i, : len(r)], r, rtol=1e-6)
        assert (batch[i, len(r):] == 0).all()
