"""Convert pretrained LPIPS-AlexNet weights (torch `lpips` package) to the
.npz consumed by vipnerf_tpu.qa.lpips_jax.

Run on a machine that has the `lpips` package + its downloaded weights:

    python tools/convert_lpips_weights.py --out lpips_alex.npz

then place the file at data/weights/lpips_alex.npz (or point
$VIPNERF_LPIPS_WEIGHTS at it).
"""

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="lpips_alex.npz")
    args = parser.parse_args()

    import lpips  # requires the torch lpips package

    model = lpips.LPIPS(net="alex")
    out = {}
    conv_i = 0
    for layer in model.net.slice1 + model.net.slice2 + model.net.slice3 + \
            model.net.slice4 + model.net.slice5:
        if layer.__class__.__name__ == "Conv2d":
            out[f"conv{conv_i}_w"] = layer.weight.detach().numpy()
            out[f"conv{conv_i}_b"] = layer.bias.detach().numpy()
            conv_i += 1
    for i, lin in enumerate(model.lins):
        out[f"lin{i}_w"] = lin.model[-1].weight.detach().numpy()
    np.savez(args.out, **out)
    print(f"wrote {args.out} with {len(out)} arrays ({conv_i} convs)")


if __name__ == "__main__":
    main()
