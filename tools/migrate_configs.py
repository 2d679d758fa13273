"""One-shot migration of the 12 reference YAML configs into the unified
dcvgan-tpu schema (run from the repo root: ``python tools/migrate_configs.py``).

Reads ``/root/reference/config/*.yml`` (both schema generations, SURVEY.md
§2.3), migrates through :func:`dcvgan_tpu.config.migrate_legacy_schema`,
validates, and writes fully-resolved configs to ``configs/``.
"""

import sys
from pathlib import Path

import yaml

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dcvgan_tpu.config import ExperimentConfig, save_config

REFERENCE_CONFIG_DIR = Path("/root/reference/config")
OUT_DIR = Path(__file__).resolve().parent.parent / "configs"


def main() -> None:
    OUT_DIR.mkdir(exist_ok=True)
    for src in sorted(REFERENCE_CONFIG_DIR.glob("*.yml")):
        with open(src) as f:
            raw = yaml.safe_load(f)
        cfg = ExperimentConfig.from_dict(raw)
        cfg.validate()
        dst = OUT_DIR / src.name
        save_config(cfg, dst)
        print(f"migrated {src.name}")


if __name__ == "__main__":
    main()
