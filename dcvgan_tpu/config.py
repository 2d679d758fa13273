"""Typed configuration schema and YAML loader.

Replaces the reference's raw-PyYAML-dict config plumbing
(``/root/reference/src/train.py:49-61`` passes an untyped dict everywhere)
with a validated dataclass schema. The schema covers the union of the two
YAML generations that coexist in ``/root/reference/config/`` (see SURVEY.md
§2.3):

- the *current* schema (``geometric_info: {name, channel}``, per-model
  ``ggen/cgen/idis/vdis/gdis`` blocks, ``loss``, ``evaluation`` …), and
- the *stale* schema used by ``mug-depth.yml`` / ``debug-mug-depth.yml``
  (merged ``gen:`` block, string ``geometric_info``, no ``gdis``/``loss``/
  ``evaluation`` keys), which :func:`load_config` migrates transparently.

New, TPU-specific fields (``mesh``, ``precision`` …) all have defaults so
every migrated reference config stays valid.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional, Union

import yaml

# geometric-info name -> channel count, as fixed by the reference datasets
# (/root/reference/src/dataset.py:134-181: depth=1, optical-flow=2,
#  segmentation=25-class one-hot).
GEOMETRIC_INFO_CHANNELS = {
    "depth": 1,
    "optical-flow": 2,
    "segmentation": 25,
}

VALID_LOSSES = ("adversarial-loss", "hinge-loss")
VALID_METRICS = ("is", "fid", "prd", "fvd")
VALID_PRECISIONS = ("float32", "bfloat16")


class ConfigError(ValueError):
    """Raised when a config file fails schema validation."""


@dataclass
class GeometricInfoConfig:
    """Type of geometric conditioning video (reference: geometric_info block)."""

    name: str = "depth"
    channel: int = 1

    def validate(self) -> None:
        if self.name not in GEOMETRIC_INFO_CHANNELS:
            raise ConfigError(
                f"geometric_info.name must be one of "
                f"{sorted(GEOMETRIC_INFO_CHANNELS)}, got {self.name!r}"
            )
        expected = GEOMETRIC_INFO_CHANNELS[self.name]
        if self.channel != expected:
            raise ConfigError(
                f"geometric_info.channel for {self.name!r} must be {expected}, "
                f"got {self.channel}"
            )


@dataclass
class OptimizerConfig:
    """Adam hyperparameters.

    The reference uses ``optim.Adam(lr, betas=(0.5, 0.999), weight_decay)``
    (/root/reference/src/train.py:167-179). torch's ``weight_decay`` is the
    *coupled* form (decay added to the gradient before the moment updates),
    which we reproduce with ``optax.add_decayed_weights`` placed before
    ``scale_by_adam``.
    """

    lr: float = 2e-4
    decay: float = 1e-5
    b1: float = 0.5
    b2: float = 0.999
    eps: float = 1e-8

    def validate(self) -> None:
        if self.lr <= 0:
            raise ConfigError(f"optimizer.lr must be positive, got {self.lr}")
        if self.decay < 0:
            raise ConfigError(f"optimizer.decay must be >= 0, got {self.decay}")


@dataclass
class GGenConfig:
    """Geometric video generator (reference: GeometricVideoGenerator)."""

    dim_z_content: int = 40
    dim_z_motion: int = 10
    ngf: int = 64
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)

    def validate(self) -> None:
        for k in ("dim_z_content", "dim_z_motion", "ngf"):
            if getattr(self, k) <= 0:
                raise ConfigError(f"ggen.{k} must be positive")
        self.optimizer.validate()


@dataclass
class CGenConfig:
    """Color video generator (reference: ColorVideoGenerator)."""

    dim_z_color: int = 10
    ngf: int = 64
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)

    def validate(self) -> None:
        for k in ("dim_z_color", "ngf"):
            if getattr(self, k) <= 0:
                raise ConfigError(f"cgen.{k} must be positive")
        self.optimizer.validate()


@dataclass
class DiscriminatorConfig:
    """Shared schema for idis / vdis / gdis blocks."""

    use_noise: bool = False
    noise_sigma: float = 0.0
    ndf: int = 64
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)

    def validate(self) -> None:
        if self.ndf <= 0:
            raise ConfigError("discriminator ndf must be positive")
        if self.noise_sigma < 0:
            raise ConfigError("noise_sigma must be >= 0")
        self.optimizer.validate()


@dataclass
class DatasetConfig:
    name: str = "mock"
    path: str = "data/raw/mock"
    n_workers: int = 4
    number_limit: int = -1
    # Root for processed data; reference hardcodes "data/processed"
    # (/root/reference/src/dataset.py:14).
    processed_root: str = "data/processed"
    # Frame-image extension (the reference hardwires "jpg" for real datasets
    # and "png" for the mock fixture, /root/reference/src/dataset.py:71).
    extension: str = "jpg"
    # Cache decoded uint8 frame stacks in host RAM (one entry per video).
    # Removes the image-decode hot loop after the first epoch for datasets
    # that fit memory.
    cache_decoded: bool = False

    def validate(self) -> None:
        if self.n_workers < 0:
            raise ConfigError("dataset.n_workers must be >= 0")


@dataclass
class EvaluationConfig:
    batchsize: int = 50
    num_samples: int = 200
    metrics: List[str] = field(default_factory=lambda: ["is", "fid"])
    # Path to feature-extractor weights (.npz from tools/convert_c3d.py or
    # tools/train_extractor.py). None = the fixed seeded extractor
    # (relative tracking only). Every score record carries the extractor
    # fingerprint either way. Relative paths resolve against the CWD, then
    # the repo root (resolution + existence are checked where the extractor
    # is actually built, so run dirs whose provenance config carries this
    # field stay loadable for infer/serve from any CWD).
    extractor_weights: Optional[str] = None
    # How many real clips FID/PRD statistics are estimated from: a seeded
    # random subset of this size, or <= 0 for the full processed set — the
    # reference's protocol compares against its entire color-mp4 tree
    # (/root/reference/src/trainer.py:205). 512 keeps in-training evals
    # cheap; final scoring runs should set 0.
    max_real_samples: int = 512

    def validate(self) -> None:
        if self.batchsize <= 0 or self.num_samples <= 0:
            raise ConfigError("evaluation.batchsize/num_samples must be positive")
        for m in self.metrics:
            if m not in VALID_METRICS:
                raise ConfigError(
                    f"evaluation.metrics entries must be in {VALID_METRICS}, got {m!r}"
                )


@dataclass
class MeshConfig:
    """Device-mesh layout for SPMD training (new; the reference is single-GPU).

    ``data`` is the batch-parallel axis over ICI. ``-1`` means "all visible
    devices". A ``time`` axis is named so the 3D-conv critics could shard the
    temporal axis with halo exchange later; it stays 1 for video_length=16.
    ``dcn`` is the outermost batch-parallel axis for multi-slice training:
    replicas on different pod slices connected by data-center network. The
    batch shards over (dcn, data); gradient all-reduces over ``dcn`` ride
    DCN once per step, while everything bandwidth-hungry stays on ICI.
    """

    data: int = -1
    time: int = 1
    dcn: int = 1

    def validate(self) -> None:
        if self.data == 0 or self.time <= 0 or self.dcn <= 0:
            raise ConfigError(
                "mesh axes must be positive (data may be -1)"
            )


@dataclass
class TrainerConfig:
    """TPU-specific trainer knobs (new fields, all defaulted)."""

    # Compute dtype for model forward/backward; params stay float32.
    precision: str = "bfloat16"
    # If true, BatchNorm statistics are computed over the *global* (all-
    # replica) batch — free under jit with a batch sharded over the mesh.
    # If false, shard_map gives per-replica stats. GAN BN semantics affect
    # parity, so this is an explicit switch (SURVEY.md §2.5).
    sync_batchnorm: bool = True
    # Normalization family for all five models. "batch" = reference parity
    # (BatchNorm placement per /root/reference/src/discriminator.py:91-102
    # and the generators). "group" (perf opt-in, off the parity path) swaps
    # every BatchNorm for per-sample ChannelGroupNorm: no cross-batch
    # moment reductions (~33% of the fused step per PERFORMANCE.md), no
    # running statistics, no train/eval duality. Not supported with
    # mesh.time > 1 (the time-sharded critics implement masked *batch*
    # statistics only).
    norm: str = "batch"
    # Reference quirk (/root/reference/src/trainer.py:357-359): ggen's Adam
    # step runs twice per generator update. We reproduce the *intent*
    # (single step) by default; set true to mimic the double step.
    ggen_double_step: bool = False
    # Resume from the latest checkpoint in the run dir if present.
    resume: bool = True
    # jax.profiler trace capture into <log_dir>/profile when set.
    profile: bool = False
    # Debug option: raise on NaNs from any jitted computation
    # (jax_debug_nans; SURVEY.md §5.2 — the reference has no sanitizers).
    debug_nans: bool = False
    # Rematerialize generator forwards in the G-phase backward pass
    # (jax.checkpoint): trades ~1 extra generator forward for the largest
    # activation buffers, buying batch-size headroom in HBM.
    remat: bool = False
    # Donate state buffers into the jitted step (saves HBM).
    donate_state: bool = True
    # Ship uint8 frames to the device and dequantize on-chip (Pallas kernel,
    # ops/dequant.py) instead of normalizing to float32 on the host — 4x
    # less host->device transfer. Applies to uint8 modalities (color +
    # non-surreal depth).
    device_normalize: bool = True
    # Perf opt-in, off the parity path: run the G-phase critic forwards
    # with frozen (running) BatchNorm statistics — the stats the D phase
    # just updated — instead of recomputing batch statistics. Removes the
    # critic BN stat reductions from the G-phase forward+backward. Measured
    # wall-clock-neutral at b=20/64 (PERFORMANCE.md); kept as a semantics
    # switch. Default false = reference semantics.
    critic_stat_reuse: bool = False
    # Perf opt-in, off the parity path: draw ONE set of fake videos per
    # iteration and share it between the D phase (stop-gradient) and the G
    # phase (differentiable via jax.vjp), instead of the reference's fresh
    # generator forward per phase (/root/reference/src/trainer.py:304-305,
    # 344-349). Saves a full ggen+cgen forward per step. The G loss then
    # scores the same samples the D update just saw — a documented dynamics
    # delta. Default false = reference semantics.
    shared_fakes: bool = False
    # Perf opt-in, off the parity path: in the D phase, run each critic
    # ONCE on the concatenated [real; fake] batch (2B) instead of two
    # B-sized forwards, and split the logits. Halves critic conv dispatches
    # and doubles their MXU batch. Semantics delta: train-mode BatchNorm
    # inside the critics normalizes over the joint real+fake batch (the
    # reference normalizes each pass separately), and the Noise layers draw
    # one 2B-sized sample. Default false = reference semantics.
    critic_joint_batch: bool = False
    # Exponential moving average of the generator parameters (beyond the
    # reference): 0 disables; typical values 0.99-0.999. When enabled the
    # train state carries an EMA copy of ggen/cgen params, advanced on every
    # generator optimizer step; sampling/eval/infer can read the averaged
    # generator (``GANState.with_ema_params``), which smooths the
    # late-training FID oscillation GANs exhibit (HEADTOHEAD.md).
    ema_decay: float = 0.0
    # When EMA is enabled, use the averaged generator for in-training
    # sample logging and evaluation (the usual reason to enable it).
    ema_eval: bool = True
    # Host-side dispatch backpressure: bound how many train steps may be
    # enqueued ahead of device completion. JAX dispatch is async; with no
    # bound, a loop whose host side (decode + device_put enqueue) outruns
    # the device drain accumulates every in-flight batch's host/device
    # buffers — at reference-max scale (batch 100 ≈ 131 MB float32/step)
    # this OOM-killed a 2,000-iteration run at 129 GB host RSS. Each
    # iteration blocks on the metrics of the step dispatched this many
    # iterations ago (normally already finished — zero stall in steady
    # state). 0 disables.
    max_inflight_steps: int = 32


@dataclass
class ExperimentConfig:
    """Top-level config. Field-for-field superset of the reference YAMLs."""

    experiment_name: str = "debug"
    batchsize: int = 2
    n_epochs: int = 1
    seed: int = 0
    video_length: int = 16
    image_size: int = 64
    log_dir: str = "result/debug"
    tensorboard_dir: str = "result/debug/runs"
    log_interval: int = 1
    log_samples_interval: int = 1
    snapshot_interval: int = 1
    evaluation_interval: int = 1
    loss: str = "adversarial-loss"
    num_gen_update: int = 1
    num_dis_update: int = 1
    geometric_info: GeometricInfoConfig = field(default_factory=GeometricInfoConfig)
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    evaluation: EvaluationConfig = field(default_factory=EvaluationConfig)
    ggen: GGenConfig = field(default_factory=GGenConfig)
    cgen: CGenConfig = field(default_factory=CGenConfig)
    idis: DiscriminatorConfig = field(default_factory=DiscriminatorConfig)
    vdis: DiscriminatorConfig = field(default_factory=DiscriminatorConfig)
    gdis: DiscriminatorConfig = field(
        default_factory=lambda: DiscriminatorConfig(ndf=32, noise_sigma=0.2)
    )
    mesh: MeshConfig = field(default_factory=MeshConfig)
    trainer: TrainerConfig = field(default_factory=TrainerConfig)
    # Provenance: original YAML path, set by load_config.
    config_path: Optional[str] = None

    def validate(self) -> None:
        if self.batchsize <= 0:
            raise ConfigError("batchsize must be positive")
        if self.n_epochs <= 0:
            raise ConfigError("n_epochs must be positive")
        if self.video_length <= 1:
            raise ConfigError("video_length must be > 1")
        if self.image_size < 8 or self.image_size & (self.image_size - 1):
            raise ConfigError("image_size must be a power of two >= 8")
        if self.loss not in VALID_LOSSES:
            raise ConfigError(f"loss must be one of {VALID_LOSSES}, got {self.loss!r}")
        if self.num_gen_update <= 0 or self.num_dis_update <= 0:
            raise ConfigError("num_gen_update/num_dis_update must be positive")
        if self.trainer.precision not in VALID_PRECISIONS:
            raise ConfigError(
                f"trainer.precision must be one of {VALID_PRECISIONS}, "
                f"got {self.trainer.precision!r}"
            )
        if not 0.0 <= self.trainer.ema_decay < 1.0:
            raise ConfigError(
                f"trainer.ema_decay must be in [0, 1), got "
                f"{self.trainer.ema_decay}"
            )
        if self.trainer.norm not in ("batch", "group"):
            raise ConfigError(
                f"trainer.norm must be 'batch' or 'group', got "
                f"{self.trainer.norm!r}"
            )
        if self.trainer.norm == "group" and self.mesh.time > 1:
            raise ConfigError(
                "trainer.norm='group' is not supported with mesh.time > 1 "
                "(time-sharded critics implement masked batch statistics "
                "only)"
            )
        for sub in (
            self.geometric_info,
            self.dataset,
            self.evaluation,
            self.ggen,
            self.cgen,
            self.idis,
            self.vdis,
            self.gdis,
            self.mesh,
        ):
            sub.validate()

    # ---------------------------------------------------------------- dict io
    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, raw: Dict[str, Any]) -> "ExperimentConfig":
        raw = migrate_legacy_schema(dict(raw))
        return _build_dataclass(cls, raw, path="")


# ----------------------------------------------------------------- builders


def _build_dataclass(cls, raw: Dict[str, Any], path: str):
    if not isinstance(raw, dict):
        raise ConfigError(f"expected mapping at {path or '<root>'}, got {type(raw)}")
    fields = {f.name: f for f in dataclasses.fields(cls)}
    unknown = set(raw) - set(fields)
    if unknown:
        raise ConfigError(
            f"unknown config key(s) at {path or '<root>'}: {sorted(unknown)}"
        )
    kwargs: Dict[str, Any] = {}
    for name, f in fields.items():
        if name not in raw:
            continue
        value = raw[name]
        sub = path + "." + name if path else name
        if dataclasses.is_dataclass(f.type) or (
            isinstance(f.type, str) and f.type in _DATACLASS_NAMES
        ):
            target = _DATACLASS_NAMES[f.type] if isinstance(f.type, str) else f.type
            kwargs[name] = _build_dataclass(target, value, sub)
        else:
            kwargs[name] = value
    return cls(**kwargs)


_DATACLASS_NAMES = {
    c.__name__: c
    for c in (
        GeometricInfoConfig,
        OptimizerConfig,
        GGenConfig,
        CGenConfig,
        DiscriminatorConfig,
        DatasetConfig,
        EvaluationConfig,
        MeshConfig,
        TrainerConfig,
    )
}


def migrate_legacy_schema(raw: Dict[str, Any]) -> Dict[str, Any]:
    """Migrate a stale-schema reference YAML dict in place.

    Handles the drift documented in SURVEY.md §2.3:

    - merged ``gen:`` block -> split into ``ggen`` / ``cgen``
      (mug-depth.yml / debug-mug-depth.yml),
    - string ``geometric_info: "depth"`` -> ``{name, channel}`` mapping,
    - missing ``geometric_info`` -> depth default (mug-depth.yml),
    - missing ``gdis`` -> defaults (every config except the three isogd-depth
      variants; /root/reference/src/train.py:150-156 would KeyError on these),
    - missing ``loss`` / ``num_*_update`` / ``evaluation`` -> defaults.
    """
    if "gen" in raw:
        gen = raw.pop("gen")
        opt = gen.get("optimizer", {})
        raw.setdefault(
            "ggen",
            {
                "dim_z_content": gen.get("dim_z_content", 40),
                "dim_z_motion": gen.get("dim_z_motion", 10),
                "ngf": gen.get("ngf", 64),
                "optimizer": dict(opt),
            },
        )
        raw.setdefault(
            "cgen",
            {
                "dim_z_color": gen.get("dim_z_color", 10),
                "ngf": gen.get("ngf", 64),
                "optimizer": dict(opt),
            },
        )
    gi = raw.get("geometric_info")
    if gi is None:
        raw["geometric_info"] = {"name": "depth", "channel": 1}
    elif isinstance(gi, str):
        if gi not in GEOMETRIC_INFO_CHANNELS:
            raise ConfigError(f"unknown geometric_info {gi!r}")
        raw["geometric_info"] = {"name": gi, "channel": GEOMETRIC_INFO_CHANNELS[gi]}
    # Drop optimizer keys the schema doesn't know rather than failing on
    # forward-compat additions inside model blocks (e.g. a reference YAML
    # variant adding `optimizer.betas`). Everything outside these blocks
    # stays strict (_build_dataclass raises on unknown keys).
    _known_opt = {f.name for f in dataclasses.fields(OptimizerConfig)}
    for block in ("ggen", "cgen", "idis", "vdis", "gdis"):
        opt = raw.get(block, {}).get("optimizer") if isinstance(raw.get(block), dict) else None
        if isinstance(opt, dict):
            raw[block]["optimizer"] = {k: v for k, v in opt.items() if k in _known_opt}
    return raw


def load_config(path: Union[str, Path]) -> ExperimentConfig:
    """Load, migrate, validate a YAML config; record provenance."""
    path = Path(path)
    with open(path) as f:
        raw = yaml.safe_load(f)
    if not isinstance(raw, dict):
        raise ConfigError(f"config file {path} did not parse to a mapping")
    cfg = ExperimentConfig.from_dict(raw)
    cfg.config_path = str(path)
    cfg.validate()
    return cfg


def save_config(cfg: ExperimentConfig, path: Union[str, Path]) -> None:
    """Write the resolved config back out (run-dir provenance copy,
    reference: /root/reference/src/trainer.py:64)."""
    d = cfg.to_dict()
    d.pop("config_path", None)
    with open(path, "w") as f:
        yaml.safe_dump(d, f, sort_keys=False)


def flatten_config(cfg: ExperimentConfig) -> Dict[str, str]:
    """Flatten to "a/b/c" -> str for TB hparams
    (reference: Trainer.log_hparams, /root/reference/src/trainer.py:88-107)."""

    def _flat(item: Any, key: str) -> Dict[str, str]:
        if not isinstance(item, dict):
            return {key: str(item)}
        out: Dict[str, str] = {}
        for k, v in item.items():
            out.update(_flat(v, k if not key else f"{key}/{k}"))
        return out

    return _flat(cfg.to_dict(), "")
