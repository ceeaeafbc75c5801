#!/usr/bin/env python
"""Port the legacy-variant y11n checkpoint into the faithful yolo11n-seg tree.

The pre-fix variant ("yolo11n-seg-legacy") differs from faithful
yolo11.yaml semantics in ways that mostly do NOT change the parameter
tree (shortcut adds, activation choices); the only structural difference
is the final P5 neck C3k2 (c3k=True builds C3 inner units instead of
plain Bottlenecks). Leaves whose path+shape match are copied; the rest
keep their fresh init. The result seeds the faithful-arch training run —
a far better init than from scratch even though the ported weights
compute slightly different functions under the corrected semantics.
"""
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from flax import serialization, traverse_util

from vision_assist_tpu.models.checkpoint import load_variables, save_variables
from vision_assist_tpu.models.yolo import YoloSeg


def port(src_path: str, out_path: str, imgsz: int = 256) -> dict:
    legacy = load_variables(src_path)
    model = YoloSeg(arch="yolo11n-seg", num_classes=1)
    fresh = model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, imgsz, imgsz, 3)), train=False)

    stats = {"copied": 0, "kept_fresh": 0}

    def graft(fresh_tree, legacy_tree):
        f = traverse_util.flatten_dict(fresh_tree)
        l = traverse_util.flatten_dict(legacy_tree)
        out = {}
        for k, v in f.items():
            lv = l.get(k)
            if lv is not None and tuple(lv.shape) == tuple(v.shape):
                out[k] = lv
                stats["copied"] += 1
            else:
                out[k] = v
                stats["kept_fresh"] += 1
        return traverse_util.unflatten_dict(out)

    params = graft(fresh["params"], legacy["params"])
    bstats = graft(fresh["batch_stats"], legacy["batch_stats"])
    save_variables(out_path, {"params": params, "batch_stats": bstats})
    return stats


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "assets/weights/y11n_256_best.msgpack"
    dst = sys.argv[2] if len(sys.argv) > 2 else "runs/y11n_faithful_init.msgpack"
    print(json.dumps(port(src, dst)))
