"""TensorBoard event-writer parity (reference launch.py:162-165 creates a
TensorBoardLogger; ours hand-encodes the protos — verify a stock
TensorBoard reader decodes them exactly)."""

import pytest

from dreammat_tpu.utils import tboard


def test_crc32c_known_vectors():
    # RFC 3720 / golang hash/crc32 Castagnoli test vector
    assert tboard.crc32c(b"123456789") == 0xE3069283
    assert tboard.crc32c(b"") == 0x0


def _scalar(v):
    # TB's loader migrates simple_value into the tensor field
    # (data_compat); accept either representation
    if v.HasField("tensor") and v.tensor.float_val:
        return v.tensor.float_val[0]
    return v.simple_value


def test_event_file_decodes_with_real_tensorboard(tmp_path):
    loader_mod = pytest.importorskip("tensorboard.backend.event_processing.event_file_loader")

    logger = tboard.TensorBoardLogger(str(tmp_path))
    logger.log({"train/loss": 0.5, "train/psnr": 31.25}, step=3)
    logger.log({"train/loss": 0.25}, step=7)

    events = list(loader_mod.EventFileLoader(logger.path).Load())
    assert events[0].file_version == "brain.Event:2"
    scalar_events = [e for e in events if e.summary.value]
    assert [e.step for e in scalar_events] == [3, 7]
    vals0 = {v.tag: _scalar(v) for v in scalar_events[0].summary.value}
    assert vals0 == {"train/loss": 0.5, "train/psnr": 31.25}
    vals1 = {v.tag: _scalar(v) for v in scalar_events[1].summary.value}
    assert vals1 == {"train/loss": 0.25}
    assert all(e.wall_time > 1.7e9 for e in events)


def test_large_step_and_many_tags(tmp_path):
    loader_mod = pytest.importorskip("tensorboard.backend.event_processing.event_file_loader")

    logger = tboard.TensorBoardLogger(str(tmp_path))
    metrics = {f"m{i}": float(i) * 0.125 for i in range(40)}
    logger.log(metrics, step=3_000_000_000)  # >2^31 exercises varint int64

    events = [e for e in loader_mod.EventFileLoader(logger.path).Load()
              if e.summary.value]
    assert events[0].step == 3_000_000_000
    got = {v.tag: _scalar(v) for v in events[0].summary.value}
    assert got == metrics
