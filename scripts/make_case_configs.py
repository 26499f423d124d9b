"""Generate per-case config triples (train-bg / train-motion / eval-motion).

The reference ships YAMLs only for case-1; its data dir has case-1..6
(BASELINE.json configs list all six). This generator stamps the case-1
template for any case + prompt pair:

  python scripts/make_case_configs.py --case 3 \
      --prompt "a man is dancing" --edit_prompt "a woman is dancing"
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import yaml

TEMPLATE_DIR = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                        "configs", "case-1")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--case", type=int, required=True)
    p.add_argument("--prompt", type=str, required=True, help="source prompt")
    p.add_argument("--edit_prompt", type=str, required=True, help="target prompt")
    p.add_argument("--data_root", type=str, default="data")
    p.add_argument("--out_root", type=str, default="configs")
    args = p.parse_args()

    case = f"case-{args.case}"
    out_dir = osp.join(args.out_root, case)
    os.makedirs(out_dir, exist_ok=True)

    for name in ("train-bg.yaml", "train-motion.yaml", "eval-motion.yaml"):
        src = osp.join(TEMPLATE_DIR, name)
        with open(src) as f:
            cfg = yaml.safe_load(f)
        cfg["output_dir"] = cfg["output_dir"].replace("case-1", case)
        cfg["input_data"]["video_dir"] = f"{args.data_root}/{case}"
        cfg["input_data"]["prompt"] = args.prompt
        if "validation_data" in cfg and "prompts" in cfg["validation_data"]:
            prompts = [args.prompt]
            if name == "eval-motion.yaml":
                prompts = [args.edit_prompt]
            cfg["validation_data"]["prompts"] = prompts
        for key in ("resume_from_checkpoint", "adapter_weight_path",
                    "one_stage_checkpoint"):
            if key in cfg and isinstance(cfg[key], str):
                cfg[key] = cfg[key].replace("case-1", case)
        dst = osp.join(out_dir, name)
        with open(dst, "w") as f:
            yaml.safe_dump(cfg, f, sort_keys=False)
        print(f"wrote {dst}")


if __name__ == "__main__":
    main()
