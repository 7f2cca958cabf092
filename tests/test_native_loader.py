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
