"""Native C++ collate engine: parity vs the Python loader path + perf sanity."""
import time

import numpy as np
import pytest

from multimodal_deepfake_detection_tpu.data import DataLoader, NpyFolderDataset, make_face_npy_tree, make_audio_npy_tree
from multimodal_deepfake_detection_tpu.data.native_loader import (
    make_native_loader,
    native_available,
    native_collate_paths,
    npy_shape,
)

pytestmark = pytest.mark.skipif(not native_available(), reason="no C++ toolchain")


@pytest.fixture(scope="module")
def face_tree(tmp_path_factory):
    return make_face_npy_tree(str(tmp_path_factory.mktemp("nf")), n_per_class=4, frames=5, size=24)


def test_npy_shape(face_tree):
    ds = NpyFolderDataset(face_tree + "/train", kind="video")
    assert npy_shape(ds.files[0]) == (5, 24, 24, 3)


def test_native_matches_python_collate(face_tree):
    ds = NpyFolderDataset(face_tree + "/train", kind="video")
    py_loader = DataLoader(ds, 4, buckets=(5,), prefetch=0)
    nat_loader = make_native_loader(ds, 4, buckets=(5,), prefetch=0)
    for (pb, pl_, plen), (nb, nl, nlen) in zip(py_loader, nat_loader):
        np.testing.assert_allclose(nb, pb, atol=1e-6)
        np.testing.assert_array_equal(nl, pl_)
        np.testing.assert_array_equal(nlen, plen)


def test_native_audio_channel_triple(tmp_path_factory):
    tree = make_audio_npy_tree(str(tmp_path_factory.mktemp("na")), n_per_class=2, frames=7)
    ds = NpyFolderDataset(tree + "/train", kind="audio")
    py_loader = DataLoader(ds, 4, buckets=(7,), prefetch=0)
    nat_loader = make_native_loader(ds, 4, buckets=(7,), prefetch=0)
    (pb, _, _), (nb, _, _) = next(iter(py_loader)), next(iter(nat_loader))
    np.testing.assert_allclose(nb, pb, atol=1e-6)
    assert nb.shape == (4, 7, 3, 13)


def test_native_collate_paths_truncation_and_padding(face_tree):
    ds = NpyFolderDataset(face_tree + "/train", kind="video")
    batch, labels, lengths = native_collate_paths(
        ds.files[:2], ds.all_labels[:2], item_shape=(24, 24, 3), max_t=3, batch_size=4
    )
    assert batch.shape == (4, 3, 24, 24, 3)
    np.testing.assert_array_equal(lengths, [3, 3, 0, 0])
    assert batch[2:].sum() == 0
    ref = np.load(ds.files[0]).astype(np.float32)[:3] / 255.0
    np.testing.assert_allclose(batch[0], ref, atol=1e-6)


def test_native_error_on_missing_file(face_tree):
    with pytest.raises(IOError):
        native_collate_paths(["/nonexistent.npy"], [0], item_shape=(24, 24, 3), max_t=2)


# ---------------------------------------------------------------------------
# native MJPEG-AVI video decode engine (native/video_decode.cc)
# ---------------------------------------------------------------------------

def _write_mjpg_avi(path, n=12, size=96, seed=0):
    import cv2

    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10, (size, size))
    rng = np.random.default_rng(seed)
    frames = []
    for _ in range(n):
        f = np.clip(rng.normal(128, 40, (size, size, 3)), 0, 255).astype(np.uint8)
        f = cv2.GaussianBlur(f, (5, 5), 2)
        frames.append(f)
        w.write(f)
    w.release()
    return frames


def test_native_video_decode_matches_cv2(tmp_path):
    import cv2

    from multimodal_deepfake_detection_tpu.data.native_video import (
        decode_video,
        native_video_available,
        probe,
    )

    if not native_video_available():
        import pytest

        pytest.skip("no C++ toolchain")
    path = str(tmp_path / "t.avi")
    _write_mjpg_avi(path, n=8, size=96)
    assert probe(path) == (8, 96, 96)

    out = decode_video(path, size=(64, 64), threads=2)
    assert out is not None and out.shape == (8, 64, 64, 3) and out.dtype == np.float32

    cap = cv2.VideoCapture(path)
    ref = []
    while True:
        ok, fr = cap.read()
        if not ok:
            break
        fr = cv2.cvtColor(fr, cv2.COLOR_BGR2RGB)
        ref.append(cv2.resize(fr, (64, 64)).astype(np.float32) / 255.0)
    cap.release()
    ref = np.stack(ref)
    # different IDCT + DCT-domain downscale vs full-decode+bilinear: small
    # per-pixel deviations are expected, gross mismatch is not
    d = np.abs(out - ref)
    assert d.mean() < 3 / 255 and d.max() < 32 / 255

    # max_frames truncation + native full-size decode
    out3 = decode_video(path, max_frames=3)
    assert out3.shape == (3, 96, 96, 3)


def test_native_video_decode_rejects_non_avi(tmp_path):
    from multimodal_deepfake_detection_tpu.data.native_video import decode_video

    p = tmp_path / "x.avi"
    p.write_bytes(b"not a riff file at all" * 10)
    assert decode_video(str(p)) is None
    npy = tmp_path / "y.npy"
    np.save(npy, np.zeros((2, 4, 4, 3), np.uint8))
    assert decode_video(str(npy)) is None


def test_video_enhanced_raw_uses_native_decode(tmp_path):
    """lavdf_raw loader: native path on, off, and fallback all yield close
    frames with the right contract."""
    import json

    from multimodal_deepfake_detection_tpu.data.video_enhanced import EnhancedVideoDataset

    vids = tmp_path / "vids"
    vids.mkdir()
    _write_mjpg_avi(str(vids / "a.avi"), n=6, size=64, seed=1)
    _write_mjpg_avi(str(vids / "b.avi"), n=5, size=64, seed=2)
    meta = [
        {"file": "a.avi", "fake_periods": [], "split": "train"},
        {"file": "b.avi", "fake_periods": [[0.1, 0.4]], "split": "train"},
    ]
    mpath = tmp_path / "metadata.json"
    mpath.write_text(json.dumps(meta))

    kw = dict(mode="lavdf_raw", subset="train", lavdf_json=str(mpath),
              frame_size=(48, 48), max_frames=4)
    ds_native = EnhancedVideoDataset(str(vids), native_decode=True, **kw)
    ds_cv2 = EnhancedVideoDataset(str(vids), native_decode=False, **kw)
    assert len(ds_native) == 2
    for i in range(2):
        a, la = ds_native[i]
        b, lb = ds_cv2[i]
        assert la == lb and a.shape == b.shape == (4, 48, 48, 3)
        assert a.dtype == np.float32 and 0 <= a.min() and a.max() <= 1.0
        assert np.abs(a - b).mean() < 3 / 255
