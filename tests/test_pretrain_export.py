"""Round-trip test for the pretrained-backbone workflow's export step.

``tools/pretrain_backbone.py`` trains our flax ResNet-50 and exports it
in torchvision state_dict layout; ``tools/import_resnet50.py`` is the
consumer. Exporting a freshly initialized flax ResNet-50 and feeding the
result back through ``convert_torch`` must reproduce every backbone
tensor bit-exactly — any key-map, transpose, or stats/params mix-up
breaks the pretrain -> export -> import -> fine-tune workflow
(reference: ``sheep/resnet.py:60-67`` train_imagenet mode feeding
``sheep/sheep_localizer.py:128`` pretrained init).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "tools")

from import_resnet50 import convert_torch  # noqa: E402
from pretrain_backbone import export_torchvision_resnet50  # noqa: E402

from loans_tpu.models.resnet import ResNet


def _leaves(tree, prefix=()):
    if isinstance(tree, dict):
        for k in sorted(tree):
            yield from _leaves(tree[k], prefix + (k,))
    else:
        yield prefix, np.asarray(tree)


def test_export_import_round_trip():
    model = ResNet(n_layers=50, class_labels=16)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])

    sd = export_torchvision_resnet50(params, stats)
    # the classifier head must not leak into the backbone artifact
    assert not any(k.startswith("fc") or "Dense" in k for k in sd)

    re_params, re_stats = convert_torch(sd)

    for src, dst in ((params, re_params), (stats, re_stats)):
        src_leaves = {
            p: v for p, v in _leaves(src) if p[0] != "Dense_0"
        }
        dst_leaves = dict(_leaves(dst))
        assert set(src_leaves) == set(dst_leaves)
        for path, v in src_leaves.items():
            np.testing.assert_array_equal(
                v, dst_leaves[path], err_msg="/".join(path)
            )
