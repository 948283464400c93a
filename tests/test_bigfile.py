import numpy as np

from cross_modal_video_engine_tpu.io.bigfile import BigFile, StreamFile, write_bigfile


def _mk(tmp_path, n=10, d=4):
    names = [f"vid{i}" for i in range(n)]
    mat = np.arange(n * d, dtype=np.float32).reshape(n, d)
    write_bigfile(str(tmp_path / "feats"), names, mat)
    return names, mat, str(tmp_path / "feats")


def test_read_roundtrip(tmp_path):
    names, mat, d = _mk(tmp_path)
    bf = BigFile(d)
    assert bf.shape() == (10, 4)
    found, vecs = bf.read(["vid3", "vid0", "missing"])
    assert found == ["vid3", "vid0"]
    np.testing.assert_array_equal(vecs[0], mat[3])
    np.testing.assert_array_equal(vecs[1], mat[0])


def test_read_batch_order(tmp_path):
    names, mat, d = _mk(tmp_path)
    bf = BigFile(d)
    out = bf.read_batch(["vid5", "vid1", "vid5"])
    np.testing.assert_array_equal(out, mat[[5, 1, 5]])


def test_read_one_and_contains(tmp_path):
    names, mat, d = _mk(tmp_path)
    bf = BigFile(d)
    np.testing.assert_array_equal(bf.read_one("vid7"), mat[7])
    assert "vid7" in bf and "nope" not in bf


def test_streamfile(tmp_path):
    names, mat, d = _mk(tmp_path, n=3)
    sf = StreamFile(d)
    got = list(sf)
    assert [g[0] for g in got] == names
    np.testing.assert_array_equal(got[2][1], mat[2])
