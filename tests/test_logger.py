"""Logger tests (port of /root/reference/src/test/test_logger.py semantics:
registration, priority ordering, update/clear)."""

import numpy as np

from dcvgan_tpu.logging.logger import Logger, MetricType


def test_define_and_priority_order(tmp_path):
    logger = Logger(tmp_path / "log", tmp_path / "tb")
    logger.define("loss_gen", MetricType.Loss)
    logger.define("fid", MetricType.Float)
    keys = logger.metric_keys()
    # defaults epoch(100) / iteration(99) first, elapsed_time(-1) last
    assert keys[0] == "epoch" and keys[1] == "iteration"
    assert keys[-1] == "elapsed_time"
    assert set(keys) >= {"loss_gen", "fid"}


def test_update_and_clear(tmp_path):
    logger = Logger(tmp_path / "log")
    logger.define("loss", MetricType.Loss)
    logger.define("fid", MetricType.Float)
    logger.update("loss", 1.0)
    logger.update("loss", 3.0)
    logger.update("fid", 42.0)
    assert logger.metrics["loss"].value == [1.0, 3.0]
    assert logger.metrics["fid"].value == 42.0
    logger.clear()
    assert logger.metrics["loss"].value == []
    assert logger.metrics["fid"].value is None


def test_log_flush_writes_tb_and_file(tmp_path):
    logger = Logger(tmp_path / "log", tmp_path / "tb")
    logger.define("loss", MetricType.Loss)
    logger.update("iteration", 10)
    logger.update("loss", 2.5)
    logger.log()
    assert (tmp_path / "log" / "log").exists()
    # tensorboard event file written
    assert list((tmp_path / "tb").glob("events.*"))


def test_video_logging_accepts_channels_last(tmp_path):
    logger = Logger(tmp_path / "log", tmp_path / "tb")
    video = np.zeros((1, 4, 8, 8, 3), np.uint8)
    logger.tf_log_video(video, "v", 0)  # must not raise


def test_color_formatter_wraps_by_level():
    import logging

    from dcvgan_tpu.logging.logger import _ColorFormatter

    fmt = _ColorFormatter("%(message)s")
    rec = logging.LogRecord("t", logging.INFO, __file__, 1, "hello", (), None)
    out = fmt.format(rec)
    assert out.startswith("\x1b[32m") and out.endswith("\x1b[0m")
    rec.levelno = logging.ERROR
    assert fmt.format(rec).startswith("\x1b[31m")
