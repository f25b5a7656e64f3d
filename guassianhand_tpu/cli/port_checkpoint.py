"""Port the reference's torch checkpoint into this framework's format.

Counterpart of the reference's implicit load path (infer_one_shot.py:337-339
``torch.load('./EXPERIMENTS/pretrain_model.ckpt')`` with strict=False): a
user of the reference runs this ONCE to convert their pretrained checkpoint,
then points ``pretrained:`` in the experiment YAML at the output —
``cli.fit_one_shot`` merges it over initialized params with the same
strict=False partial semantics.

    python -m guassianhand_tpu.cli.port_checkpoint \
        --torch_ckpt ./EXPERIMENTS/pretrain_model.ckpt \
        --out ./EXPERIMENTS/pretrain_model.gh.ckpt [--dinov2 <hf_ckpt.bin>]

Prints the unmapped source keys (expected: the reference's dead modules —
see PARITY.md "Deliberately omitted").
"""
from __future__ import annotations

import argparse
import sys


def main(argv=None):
    from guassianhand_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--torch_ckpt", required=True,
                        help="reference pretrain_model.ckpt (torch)")
    parser.add_argument("--out", required=True,
                        help="output checkpoint path (this framework)")
    parser.add_argument("--dinov2", default=None,
                        help="optional HF dinov2-base state_dict to port "
                             "into the image tokenizer")
    parser.add_argument("--backbone_layers", type=int, default=10)
    args = parser.parse_args(argv)

    import torch  # cpu build is sufficient

    from guassianhand_tpu.compat.torch_port import (port_dinov2_backbone,
                                                    port_reference_checkpoint)
    from guassianhand_tpu.train import checkpoints as ckpt_lib

    raw = torch.load(args.torch_ckpt, map_location="cpu",
                     weights_only=False)
    sd = raw.get("state_dict", raw)
    params, unmapped = port_reference_checkpoint(
        sd, backbone_layers=args.backbone_layers)

    if args.dinov2:
        dino_sd = torch.load(args.dinov2, map_location="cpu",
                             weights_only=False)
        dino_params, dino_unmapped = port_dinov2_backbone(
            dino_sd.get("state_dict", dino_sd))
        params["image_tokenizer"] = dino_params
        unmapped += [f"dinov2:{k}" for k in dino_unmapped]

    # Saved as {"params": <module tree>} so cli.fit_one_shot's
    # load_params_partial (flax-variables template) finds the leaves.
    ckpt_lib.save_checkpoint(args.out, {"params": params}, opt_state=None,
                             step=0, keep_last_link=False)
    print(f"ported {sum(1 for _ in _leaves(params))} tensors -> {args.out}")
    if unmapped:
        print(f"unmapped source keys ({len(unmapped)}):")
        for k in unmapped:
            print(f"  {k}")
    return 0


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    sys.exit(main())
