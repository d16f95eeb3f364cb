"""Round-trip tests for the dependency-free TensorBoard event writer
(``utils/tb_events.py``): TFRecord framing, masked CRC32C, protobuf
encoding of scalar Events (SURVEY.md §5.5 — the reference never wrote
summaries at all)."""

import struct

import numpy as np
import pytest

from stable_diffusion_training_tpu.utils.tb_events import (
    EventFileWriter,
    crc32c,
    encode_scalar_event,
    frame_record,
    masked_crc32c,
    read_event_file,
)


class TestCRC32C:
    def test_known_vectors(self):
        # RFC 3720 / kernel test vectors for Castagnoli CRC
        assert crc32c(b"") == 0x00000000
        assert crc32c(b"123456789") == 0xE3069283
        assert crc32c(b"\x00" * 32) == 0x8A9136AA
        assert crc32c(b"\xff" * 32) == 0x62A8AB43

    def test_mask_is_invertible_shape(self):
        # masked crc stays in uint32 range
        for data in (b"", b"abc", b"\x00" * 100):
            assert 0 <= masked_crc32c(data) <= 0xFFFFFFFF


class TestFraming:
    def test_record_layout(self):
        payload = b"hello"
        rec = frame_record(payload)
        (length,) = struct.unpack("<Q", rec[:8])
        assert length == len(payload)
        assert rec[12 : 12 + length] == payload
        (pcrc,) = struct.unpack("<I", rec[12 + length :])
        assert pcrc == masked_crc32c(payload)

    def test_corruption_detected(self, tmp_path):
        w = EventFileWriter(str(tmp_path))
        w.add_scalar("a", 1.0, 0)
        w.close()
        raw = bytearray(open(w.path, "rb").read())
        raw[-3] ^= 0xFF  # flip a payload byte of the last record
        open(w.path, "wb").write(bytes(raw))
        with pytest.raises(ValueError):
            read_event_file(w.path)


class TestRoundTrip:
    def test_scalars_round_trip(self, tmp_path):
        w = EventFileWriter(str(tmp_path))
        values = [(1, 0.5), (2, -3.25), (100000, 1e-8), (2**40, 2.0)]
        for step, val in values:
            w.add_scalar("train/loss", val, step, wall_time=123.5)
        w.add_scalar("train/step_time_s", 0.7, 1)
        w.close()

        events = read_event_file(w.path)
        assert events[0]["file_version"] == "brain.Event:2"
        scalars = [e for e in events if "tag" in e]
        loss = [e for e in scalars if e["tag"] == "train/loss"]
        assert [(e["step"], pytest.approx(e["value"])) for e in loss] == [
            (s, pytest.approx(v)) for s, v in values
        ]
        assert loss[0]["wall_time"] == 123.5
        other = [e for e in scalars if e["tag"] == "train/step_time_s"]
        assert len(other) == 1
        np.testing.assert_allclose(other[0]["value"], 0.7, rtol=1e-6)

    def test_filename_pattern(self, tmp_path):
        w = EventFileWriter(str(tmp_path))
        w.close()
        import os

        assert os.path.basename(w.path).startswith("events.out.tfevents.")
