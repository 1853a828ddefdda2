"""Convert pretrained VGG16 weights into the SSD backbone format.

The reference's SSD300/512 baseline starts from ImageNet-pretrained
VGG16 (``schaaaafrichter/train.py:138-147``,
``pretrained_model='imagenet'``). This tool converts a torchvision
``vgg16`` ``state_dict`` (.pth) into a ``--resume``-able msgpack of the
``VGG16Extractor`` parameters:

  * features.{0,2,5,7,10,12,14,17,19,21,24,26,28} -> Conv_0..Conv_12
  * classifier.0 (fc6) -> atrous Conv_13 via the standard SSD
    subsampling: view (4096, 512, 7, 7), take output channels [0::4]
    (-> 1024) and spatial taps [0::3] (-> 3x3)
  * classifier.3 (fc7) -> Conv_14 (1x1): channels [0::4] both ways

No network egress here: the checkpoint must already be on disk.

Usage:
  python tools/import_vgg16.py vgg16.pth out.msgpack
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse

import numpy as np

# torch features indices of the 13 convs, in order
FEATURE_CONVS = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)


def convert_vgg16(state: dict) -> dict:
    """torchvision vgg16 state_dict -> VGG16Extractor params tree."""
    params: dict = {}
    for i, idx in enumerate(FEATURE_CONVS):
        w = np.asarray(state[f"features.{idx}.weight"])  # OIHW
        b = np.asarray(state[f"features.{idx}.bias"])
        params[f"Conv_{i}"] = {
            "kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0))),
            "bias": np.ascontiguousarray(b),
        }
    # fc6 -> atrous 3x3 conv (Conv_13)
    w6 = np.asarray(state["classifier.0.weight"]).reshape(4096, 512, 7, 7)
    b6 = np.asarray(state["classifier.0.bias"])
    w6 = w6[0::4][:, :, 0::3, 0::3]  # (1024, 512, 3, 3)
    params["Conv_13"] = {
        "kernel": np.ascontiguousarray(np.transpose(w6, (2, 3, 1, 0))),
        "bias": np.ascontiguousarray(b6[0::4]),
    }
    # fc7 -> 1x1 conv (Conv_14)
    w7 = np.asarray(state["classifier.3.weight"]).reshape(
        4096, 4096, 1, 1
    )
    b7 = np.asarray(state["classifier.3.bias"])
    w7 = w7[0::4][:, 0::4]
    params["Conv_14"] = {
        "kernel": np.ascontiguousarray(np.transpose(w7, (2, 3, 1, 0))),
        "bias": np.ascontiguousarray(b7[0::4]),
    }
    return params


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("checkpoint", help="torchvision vgg16 .pth state_dict")
    p.add_argument("output", help="output msgpack")
    args = p.parse_args(argv)

    import torch

    state = torch.load(
        args.checkpoint, map_location="cpu", weights_only=True
    )
    state = {k: v.numpy() for k, v in state.items()}
    params = convert_vgg16(state)
    from loans_tpu.train.checkpoint import save_params

    # wrap under the SSD module's backbone name
    save_params(args.output, {"VGG16Extractor_0": params})
    n = sum(
        np.asarray(v).size
        for conv in params.values()
        for v in conv.values()
    )
    print(f"wrote {args.output} ({n / 1e6:.1f}M params)")


if __name__ == "__main__":
    main()
