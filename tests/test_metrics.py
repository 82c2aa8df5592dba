"""Native TB event writer round-trip through the official reader.

io/metrics.py hand-encodes TFRecord framing + Event protobufs (replacing
the reference's torch SummaryWriter,
bbc/rsl_rl/runners/on_policy_runner.py:238-304); this verifies standard
TensorBoard tooling parses the files bit-exactly.
"""
import math

from agility_tpu.io.metrics import MetricWriter, crc32c


def test_crc32c_known_vectors():
    # RFC 3720 / kernel test vectors for Castagnoli CRC
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def test_event_file_readable_by_tensorboard(tmp_path):
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    w = MetricWriter(str(tmp_path))
    vals = {"Loss/surrogate": -0.0173, "Train/mean_reward": 12.5}
    for step in range(3):
        w.scalars({k: v + step for k, v in vals.items()}, step=step)
    w.scalar("Perf/fps", 649800.0, step=2)
    w.close()

    acc = EventAccumulator(str(tmp_path))
    acc.Reload()
    tags = set(acc.Tags()["scalars"])
    assert {"Loss/surrogate", "Train/mean_reward", "Perf/fps"} <= tags
    surr = acc.Scalars("Loss/surrogate")
    assert [e.step for e in surr] == [0, 1, 2]
    for e, step in zip(surr, range(3)):
        assert math.isclose(e.value, vals["Loss/surrogate"] + step,
                            rel_tol=1e-6)
    assert math.isclose(acc.Scalars("Perf/fps")[0].value, 649800.0,
                        rel_tol=1e-6)
