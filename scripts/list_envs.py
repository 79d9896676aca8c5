"""List all registered task environments (reference scripts/reinforcement_learning/list_envs.py)."""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # repo root, so scripts run from anywhere

from tacex_tpu import envs


def main() -> None:
    print(f"{'env id':<45} {'class':<25} num_envs  obs")
    for env_id in envs.registered_envs():
        env = envs.make(env_id, num_envs=1)
        obs_desc = getattr(env.cfg, "obs_mode", "-")
        print(f"{env_id:<45} {type(env).__name__:<25} {env.cfg.num_envs:<8} {obs_desc}")


if __name__ == "__main__":
    main()
