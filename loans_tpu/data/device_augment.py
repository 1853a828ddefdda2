"""On-device, label-preserving augmentation for assessor crops.

The reference augments *localizer* images on the host with imgaug
(``common/datasets/image_dataset.py:57-69``) but trains the assessor on
a fixed pre-generated crop set (``train_sheep_localizer.py:85-96``),
which our round-2 diagnostics showed the assessor memorizes. Host-side
augmentation can't keep up with the device-resident scanned training
path (the whole point is zero host traffic), so these transforms run
inside the jitted step on the gathered batch: horizontal flip plus
photometric jitter — all invariant w.r.t. the crop's IoU label.

Everything is shape-static, vectorized over the batch, and cheap VPU
work that XLA fuses into the surrounding step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def photometric(rng: jax.Array, images: jax.Array) -> jax.Array:
    """Brightness/contrast/saturation jitter, clipped to [0, 1].

    Label-free for any box/IoU supervision; shared by the assessor crop
    augmentation below and the SSD device pipeline
    (``data/ssd_device.py``)."""
    k_bright, k_contrast, k_sat = jax.random.split(rng, 3)
    n = images.shape[0]
    dt = images.dtype
    brightness = jax.random.uniform(
        k_bright, (n, 1, 1, 1), minval=-0.12, maxval=0.12, dtype=dt
    )
    contrast = jax.random.uniform(
        k_contrast, (n, 1, 1, 1), minval=0.8, maxval=1.25, dtype=dt
    )
    mean = jnp.mean(images, axis=(1, 2, 3), keepdims=True)
    images = (images - mean) * contrast + mean + brightness
    if images.shape[-1] == 3:
        sat = jax.random.uniform(
            k_sat, (n, 1, 1, 1), minval=0.7, maxval=1.3, dtype=dt
        )
        gray = jnp.mean(images, axis=-1, keepdims=True)
        images = gray + (images - gray) * sat
    return jnp.clip(images, 0.0, 1.0)


def augment_crops(rng: jax.Array, images: jax.Array) -> jax.Array:
    """Randomly flip + photometrically jitter a batch of float crops.

    Args:
      rng: PRNG key (one per step; internally split per transform).
      images: (N, H, W, C) float in [0, 1].

    Returns:
      (N, H, W, C) augmented images, clipped to [0, 1]. IoU labels are
      unchanged by construction: horizontal flip preserves the crop
      window/object overlap, photometric changes don't move anything.
    """
    k_flip, k_photo = jax.random.split(rng)
    n = images.shape[0]

    flip = jax.random.bernoulli(k_flip, 0.5, (n, 1, 1, 1))
    images = jnp.where(flip, images[:, :, ::-1, :], images)
    return photometric(k_photo, images)
