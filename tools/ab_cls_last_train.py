#!/usr/bin/env python3
"""Same-process A/B: the CLIP fine-tune step with the trainable CLS-only
last layer (models/vit._cls_last_layer, cfg.cls_last) vs the full-stream
last block.

Only the CLS row of the last block survives the stack, so the other S−1
rows' out-projection + MLP — forward AND backward — are dead work whose
cotangents are identically zero; dropping them is gradient-exact
(pinned in tests/test_vit_cls_last.py).  This tool measures what that
dead work costs on hardware at the production fine-tune shape.

Prints one JSON line: ms/step medians for both variants plus the one-step
loss agreement.

ANSWER (v5e, 2026-08-19, two sessions): 52.2-52.3 → 46.4-47.7 ms/step at
32 pairs (−9 to −11%), loss rel dev ≤ 1.5e-5 (the CLS row's math is
unchanged, only dead rows are dropped).  cls_last=True ships as the
ClipFinetuneConfig default and in train_end's tower.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax.numpy as jnp
    import numpy as np

    from patent_tpu.models.vit import VIT_B16
    from patent_tpu.train.finetune_clip import (init_finetune_state,
                                                make_finetune_step)
    from patent_tpu.utils.compile_cache import enable_compilation_cache
    from patent_tpu.utils.config import ClipFinetuneConfig
    from patent_tpu.utils.timing import timed_seconds_per_iter

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    pairs = 32                                       # 64 images on device
    images = jnp.asarray(rng.random((2 * pairs, 224, 224, 3)), jnp.float32)
    node_idx = jnp.asarray(rng.integers(0, 64, pairs), jnp.int32)
    vgae = rng.standard_normal((64, 256)).astype(np.float32)

    states = {}
    out = {"unit": "ms/step"}
    for name, cls_last in (("full_last", False), ("cls_last", True)):
        cfg = ClipFinetuneConfig(batch_size=pairs, cls_last=cls_last)
        (vit, head), params, opt, opt_state = init_finetune_state(
            VIT_B16, cfg, vgae, seed=0)
        step, _ = make_finetune_step(vit, head, opt, cfg)
        t0 = time.perf_counter()
        _, _, metrics = step(params, opt_state, images, node_idx,
                             jnp.float32(0.05))
        loss0 = float(metrics["loss"])
        print(f"# compiled {name} in {time.perf_counter() - t0:.1f}s "
              f"loss={loss0:.5f}", flush=True)
        states[name] = (step, params, opt_state)
        out[f"{name}_loss0"] = round(loss0, 5)

    reps = 3
    res: dict[str, list[float]] = {}
    for _rep in range(reps):
        for name, (step, params, opt_state) in states.items():
            dt = timed_seconds_per_iter(
                lambda s=step, p=params, o=opt_state: s(
                    p, o, images, node_idx, jnp.float32(0.05)),
                lambda r: float(r[2]["loss"]))
            res.setdefault(name, []).append(dt * 1e3)
    for name, v in res.items():
        out[name] = round(sorted(v)[len(v) // 2], 2)
    out["loss_rel_dev"] = round(
        abs(out["cls_last_loss0"] - out["full_last_loss0"])
        / (abs(out["full_last_loss0"]) + 1e-9), 6)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
