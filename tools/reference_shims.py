"""Import shims that let the UNMODIFIED torch reference (/root/reference/src)
train in this environment for the head-to-head quality comparison.

Three wheels the reference imports are not installed here (zero egress):
``colorlog`` (logger.py:9), ``scikit-video`` (dataio.py:6), and ``evan``
(trainer.py:15). ``install()`` registers minimal stand-ins in ``sys.modules``
BEFORE the reference modules are imported. The stand-ins reimplement only the
public surface the reference touches:

- colorlog.ColoredFormatter(fmt, datefmt=...) -> plain logging.Formatter with
  the %(log_color)s token stripped (logger.py:115-117).
- skvideo.io.vreader(path) -> RGB uint8 frame generator (dataio.py:152);
  skvideo.io.FFmpegWriter(path, inputdict={"-r": fps}) with
  .writeFrame()/.close() (dataio.py:202-206) — both backed by cv2.
- evan.score.compute_inception_score / compute_frechet_distance /
  compute_precision_recall over mp4 directories (trainer.py:209-219) —
  backed by tools/headtohead_score.py (the committed extractor), and each
  evaluated sample set is archived for post-hoc re-scoring so both
  frameworks' trajectories can be compared under one protocol.

No reference code is copied here; these are independent implementations of
third-party APIs.
"""

from __future__ import annotations

import json
import logging
import shutil
import sys
import time
import types
from pathlib import Path

import cv2
import numpy as np

REPO = Path(__file__).resolve().parents[1]


# ---------------------------------------------------------------- colorlog
def _make_colorlog() -> types.ModuleType:
    mod = types.ModuleType("colorlog")

    class ColoredFormatter(logging.Formatter):
        def __init__(self, fmt=None, datefmt=None, *a, **k):
            if fmt:
                for token in ("%(log_color)s", "%(reset)s"):
                    fmt = fmt.replace(token, "")
            super().__init__(fmt, datefmt=datefmt)

    mod.ColoredFormatter = ColoredFormatter
    return mod


# ---------------------------------------------------------------- skvideo
def _make_skvideo() -> types.ModuleType:
    io = types.ModuleType("skvideo.io")

    def vreader(path):
        cap = cv2.VideoCapture(str(path))
        try:
            while True:
                ok, frame = cap.read()
                if not ok:
                    return
                yield cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        finally:
            cap.release()

    class FFmpegWriter:
        """mp4 writer with scikit-video's writeFrame/close surface.

        Layout repair: the reference's ``trainer.evaluate`` passes
        ``(C, T, H, W)`` sample arrays into ``dataio.write_video``'s
        ``(T, H, W, C)`` API (/root/reference/src/trainer.py:202 +
        dataio.py:186-206, util.py:289-291), so each writeFrame call
        receives a channel-plane ``(T, H, W)`` — under real scikit-video
        that silently produces a 3x-length grayscale mp4 of stacked
        channel planes. Here, frames whose last dim is not a channel
        count are buffered and reassembled at close() into the intended
        ``(T, H, W, 3)`` color video, so eval mp4s are scoreable.
        """

        def __init__(self, path, inputdict=None, outputdict=None):
            self.path = str(path)
            self.fps = float((inputdict or {}).get("-r", 25))
            self._writer = None
            self._planes = []

        def _write(self, frame):
            h, w = frame.shape[:2]
            if self._writer is None:
                fourcc = cv2.VideoWriter_fourcc(*"mp4v")
                self._writer = cv2.VideoWriter(self.path, fourcc, self.fps, (w, h))
            self._writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))

        def writeFrame(self, frame):
            frame = np.asarray(frame)
            if frame.dtype != np.uint8:
                frame = frame.clip(0, 255).astype(np.uint8)
            if frame.ndim == 2:
                frame = np.stack([frame] * 3, axis=-1)
            if frame.ndim == 3 and frame.shape[-1] not in (1, 3, 4):
                self._planes.append(frame)  # (T, H, W) channel plane
                return
            if frame.shape[-1] == 1:
                frame = np.repeat(frame, 3, axis=-1)
            self._write(frame)

        def close(self):
            if self._planes:
                video = np.stack(self._planes, axis=-1)  # (T, H, W, C)
                self._planes = []
                if video.shape[-1] == 1:
                    video = np.repeat(video, 3, axis=-1)
                for frame in video:
                    self._write(frame)
            if self._writer is not None:
                self._writer.release()
                self._writer = None

    io.vreader = vreader
    io.FFmpegWriter = FFmpegWriter
    pkg = types.ModuleType("skvideo")
    pkg.io = io
    return pkg, io


# ------------------------------------------------------------------- evan
class _EvanScore(types.ModuleType):
    """evan.score backed by the shared head-to-head scorer.

    ``archive_dir``: when set, every distinct generated-sample directory is
    copied to ``archive_dir/eval_NNN/`` and its scores appended to
    ``archive_dir/scores.jsonl`` (one record per eval, both metrics).
    """

    def __init__(self):
        super().__init__("evan.score")
        self.archive_dir: Path | None = None
        self.batchsize = 32
        self._seen: dict[str, Path] = {}
        self._pending: dict[str, dict] = {}

    # -- helpers -----------------------------------------------------------
    def _archive(self, gen_dir) -> str:
        key = str(gen_dir)
        if self.archive_dir is None:
            return key
        if key not in self._seen:
            idx = len(self._seen)
            dst = Path(self.archive_dir) / f"eval_{idx:03d}"
            if dst.exists():
                shutil.rmtree(dst)
            shutil.copytree(gen_dir, dst)
            self._seen[key] = dst
            self._pending[key] = {"eval_index": idx, "time": time.time()}
        return key

    def _record(self, key: str, metric: str, value) -> None:
        if self.archive_dir is None or key not in self._pending:
            return
        rec = self._pending[key]
        rec[metric] = value
        path = Path(self.archive_dir) / "scores.jsonl"
        with path.open("a") as f:
            f.write(json.dumps({"metric": metric, "value": value,
                                "eval_index": rec["eval_index"]}) + "\n")

    # -- the public evan surface (trainer.py:209-219) ----------------------
    def compute_inception_score(self, gen_dir, batchsize=100, verbose=False):
        from tools.headtohead_score import score_dirs

        key = self._archive(gen_dir)
        val = score_dirs(gen_dir, None, ["is"], self.batchsize)["is"]
        self._record(key, "is", val)
        return val

    def compute_frechet_distance(self, gen_dir, ref_dir, batchsize=100,
                                 verbose=False):
        from tools.headtohead_score import score_dirs

        key = self._archive(gen_dir)
        val = score_dirs(gen_dir, ref_dir, ["fid"], self.batchsize)["fid"]
        self._record(key, "fid", val)
        return val

    def compute_precision_recall(self, gen_dir, ref_dir, batchsize=100,
                                 verbose=False):
        from tools.headtohead_score import score_dirs

        key = self._archive(gen_dir)
        out = score_dirs(gen_dir, ref_dir, ["prd"], self.batchsize)
        self._record(key, "prd", out["prd"])
        return out["prd"]


def install(archive_dir: Path | None = None, eval_batchsize: int = 32):
    """Register the shims; idempotent. Returns the evan.score stub."""
    if str(REPO) not in sys.path:
        sys.path.insert(0, str(REPO))

    if "colorlog" not in sys.modules:
        sys.modules["colorlog"] = _make_colorlog()
    if "skvideo" not in sys.modules:
        pkg, io = _make_skvideo()
        sys.modules["skvideo"] = pkg
        sys.modules["skvideo.io"] = io
    if "evan" not in sys.modules:
        evan = types.ModuleType("evan")
        evan.score = _EvanScore()
        sys.modules["evan"] = evan
        sys.modules["evan.score"] = evan.score
    score = sys.modules["evan"].score
    if archive_dir is not None:
        score.archive_dir = Path(archive_dir)
        score.archive_dir.mkdir(parents=True, exist_ok=True)
    score.batchsize = eval_batchsize
    return score
