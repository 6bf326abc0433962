"""Strip a trainer checkpoint to params-only for release/distribution.

    python scripts/make_release_ckpt.py <trainer_ckpt_dir> <out_dir>
"""

import sys

sys.path.insert(0, ".")

from pcgcv1_tpu.utils import checkpoint as ckpt_lib


def main():
    src, dst = sys.argv[1], sys.argv[2]
    state = ckpt_lib.restore(src)
    if state is None:
        raise SystemExit(f"no checkpoint in {src}")
    params = state.get("params", state)
    step = int(state["step"]) if "step" in state else None
    path = ckpt_lib.save(dst, {"params": params}, step=step)
    print(f"wrote {path} (step {step})")


if __name__ == "__main__":
    main()
