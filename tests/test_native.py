"""Native frame pump tests (C++ build + ctypes binding)."""

import numpy as np
import pytest

from ptam_cg_tpu.io import tum

native = pytest.importorskip("ptam_cg_tpu.native")


@pytest.fixture(scope="module")
def lib_ok():
    if native.load_library() is None:
        pytest.skip("no g++ toolchain")
    return True


def make_ds(tmp_path, n=6):
    frames = [np.random.default_rng(i).uniform(0, 255, (24, 32))
              .astype(np.float32) for i in range(n)]
    tum.write_synthetic_dataset(str(tmp_path), frames)
    return frames


def test_native_pump_matches_python_loader(tmp_path, lib_ok):
    frames = make_ds(tmp_path)
    with native.NativeFramePump(str(tmp_path), prefetch=2) as pump:
        assert len(pump) == 6
        for i in range(6):
            ts, fr = pump.next_frame()
            assert fr.shape == (24, 32)
            np.testing.assert_allclose(fr, frames[i], atol=1e-5)
            assert ts == pytest.approx(i / 25.0)


def test_native_pump_wraps_around(tmp_path, lib_ok):
    frames = make_ds(tmp_path, 3)
    with native.NativeFramePump(str(tmp_path), prefetch=2) as pump:
        for i in range(7):
            _, fr = pump.next_frame()
            np.testing.assert_allclose(fr, frames[i % 3], atol=1e-5)


def test_native_pump_non_looping_stops(tmp_path, lib_ok):
    make_ds(tmp_path, 2)
    with native.NativeFramePump(str(tmp_path), prefetch=2,
                                loop=False) as pump:
        pump.next_frame()
        pump.next_frame()
        with pytest.raises(StopIteration):
            pump.next_frame()


def test_native_pump_uint8_npy(tmp_path, lib_ok):
    (tmp_path / "rgb").mkdir()
    arr = np.arange(12, dtype=np.uint8).reshape(3, 4)
    np.save(tmp_path / "rgb" / "u8.npy", arr)
    (tmp_path / "rgb.txt").write_text("0.5 rgb/u8.npy\n")
    with native.NativeFramePump(str(tmp_path)) as pump:
        ts, fr = pump.next_frame()
        np.testing.assert_allclose(fr, arr.astype(np.float32))


def test_native_pump_pgm(tmp_path, lib_ok):
    arr = np.arange(6, dtype=np.uint8).reshape(2, 3) * 40
    (tmp_path / "rgb").mkdir()
    with open(tmp_path / "rgb" / "f.pgm", "wb") as f:
        f.write(b"P5\n# comment\n3 2\n255\n")
        f.write(arr.tobytes())
    (tmp_path / "rgb.txt").write_text("1.0 rgb/f.pgm\n")
    with native.NativeFramePump(str(tmp_path)) as pump:
        _, fr = pump.next_frame()
        np.testing.assert_allclose(fr, arr.astype(np.float32))


def test_missing_dataset_raises(tmp_path, lib_ok):
    with pytest.raises(FileNotFoundError):
        native.NativeFramePump(str(tmp_path / "nonexistent"))
