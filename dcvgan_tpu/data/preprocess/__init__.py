"""Raw-dataset preprocessors + explicit registry.

The reference dispatches preprocess functions with ``eval()`` on the config
string (/root/reference/src/train.py:95); here it's a registry keyed by
dataset name. ``mock`` regenerates the synthetic fixture; ``mug`` remains a
documented stub exactly like the reference
(/root/reference/src/preprocess/mug.py:26).
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Dict

PreprocessFunc = Callable[[Path, Path, str, int, int, int], None]

_REGISTRY: Dict[str, PreprocessFunc] = {}


def register(name: str):
    def deco(fn: PreprocessFunc) -> PreprocessFunc:
        _REGISTRY[name] = fn
        return fn

    return deco


def get_preprocessor(name: str) -> PreprocessFunc:
    # import on demand so cv2-heavy modules don't load unless needed;
    # variant names live in their base module ("synthetic-large" ->
    # synthetic.py registers both)
    if name not in _REGISTRY:
        import importlib

        for mod in (name.replace("-", "_"), name.split("-")[0]):
            try:
                importlib.import_module(f"dcvgan_tpu.data.preprocess.{mod}")
            except ModuleNotFoundError:
                continue
            if name in _REGISTRY:
                break
    if name not in _REGISTRY:
        raise KeyError(
            f"no preprocessor registered for dataset {name!r}; "
            f"have {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]


@register("mock")
def preprocess_mock_dataset(
    dataset_path: Path,
    save_path: Path,
    mode: str,
    length: int,
    img_size: int,
    n_jobs: int,
) -> None:
    """Regenerate the synthetic mock fixture (tests + debug configs)."""
    del dataset_path, mode, length, n_jobs
    from dcvgan_tpu.data.mock import generate_mock_dataset

    generate_mock_dataset(Path(save_path), image_size=img_size)


@register("mug")
def preprocess_mug_dataset(
    dataset_path: Path,
    save_path: Path,
    mode: str,
    length: int,
    img_size: int,
    n_jobs: int,
) -> None:
    """MUG preprocessing was performed out-of-band in the reference and left
    unimplemented (/root/reference/src/preprocess/mug.py:14-26)."""
    raise NotImplementedError(
        "MUG preprocessing is not implemented (matches the reference); "
        "provide a preprocessed directory tree instead"
    )
