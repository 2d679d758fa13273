"""Training CLI (reference: /root/reference/src/train.py).

Usage: ``python -m dcvgan_tpu.cli.train --config configs/mug-depth.yml``
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Optional, Sequence

from dcvgan_tpu.config import load_config
from dcvgan_tpu.data.dataset import VideoDataset
from dcvgan_tpu.data.preprocess import get_preprocessor
from dcvgan_tpu.parallel.mesh import multihost_init
from dcvgan_tpu.train.trainer import Trainer


def build_dataset(cfg) -> VideoDataset:
    # Unknown dataset names are still trainable when a preprocessed tree
    # already exists on disk (the reference's eval() dispatch would die here,
    # /root/reference/src/train.py:95); only a cold start needs the registry.
    try:
        preprocess_func = get_preprocessor(cfg.dataset.name)
    except KeyError:
        processed = Path(cfg.dataset.processed_root) / cfg.dataset.name / "train"
        if not processed.exists():
            raise
        preprocess_func = None

    return VideoDataset(
        name=cfg.dataset.name,
        dataset_path=cfg.dataset.path,
        preprocess_func=preprocess_func,
        video_length=cfg.video_length,
        image_size=cfg.image_size,
        number_limit=cfg.dataset.number_limit,
        geometric_info=cfg.geometric_info.name,
        processed_root=cfg.dataset.processed_root,
        extension=cfg.dataset.extension,
        # raw passthrough: uint8 modalities (color, non-surreal depth)
        # ship unnormalized; optical flow ships float16; segmentation
        # ships class labels. The train step normalizes/upcasts on device.
        raw_uint8=cfg.trainer.device_normalize,
        cache_decoded=cfg.dataset.cache_decoded,
    )


def build_evaluator(cfg, dataset):
    if not cfg.evaluation.metrics:
        return None
    from dcvgan_tpu.eval.evaluator import Evaluator
    from dcvgan_tpu.eval.features import FeatureExtractor

    extractor = None
    if cfg.evaluation.extractor_weights:
        path = Path(cfg.evaluation.extractor_weights)
        if not path.exists() and not path.is_absolute():
            # repo-root fallback: provenance configs store the repo-relative
            # path (e.g. assets/extractor-synthetic.npz) and training may be
            # launched from elsewhere
            repo_root = Path(__file__).resolve().parent.parent.parent
            candidate = repo_root / path
            if candidate.exists():
                path = candidate
        if not path.exists():
            raise FileNotFoundError(
                f"evaluation.extractor_weights not found: "
                f"{cfg.evaluation.extractor_weights}"
            )
        extractor = FeatureExtractor(weights_path=str(path))
    return Evaluator(
        metrics=cfg.evaluation.metrics,
        num_samples=cfg.evaluation.num_samples,
        batchsize=cfg.evaluation.batchsize,
        dataset=dataset,
        extractor=extractor,
        max_real_samples=cfg.evaluation.max_real_samples,
    )


def main(argv: Optional[Sequence[str]] = None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--config", "-c", required=True, help="training configuration YAML"
    )
    args = parser.parse_args(argv)

    multihost_init()
    # persistent, machine-keyed compile cache: restarting/resuming a run
    # skips the multi-minute step recompile (utils/compile_cache.py)
    from dcvgan_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache(Path(__file__).resolve().parent.parent.parent)
    cfg = load_config(args.config)
    dataset = build_dataset(cfg)
    evaluator = build_evaluator(cfg, dataset)
    trainer = Trainer(cfg, dataset, evaluator=evaluator)
    trainer.train()


if __name__ == "__main__":
    main()
