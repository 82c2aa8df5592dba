"""Depth-vision student networks: CNN backbone, recurrent encoder, BYOL.

Flax re-design of tsc/rsl_rl/modules/depth_backbone.py (+ byol.py, itself
lucidrains-derived): DepthOnlyFCBackbone58x87 CNN, the GRU(512) recurrent
encoder emitting [32 depth latent | 2 delta-yaw | 6 obstacle-type softmax],
and a BYOL self-supervised learner with depth-specific augmentations
(background-noise patches, pixel dropout, gaussian noise/blur).
"""
from __future__ import annotations

from typing import Any, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class DepthBackbone58x87(nn.Module):
    """Conv5 -> maxpool2 -> ELU -> conv3 -> ELU -> FC128 -> latent
    (reference depth_backbone.py:75-109)."""
    output_dim: int = 32
    output_activation: str = "elu"   # reference default: activation (elu)

    @nn.compact
    def __call__(self, img):          # (..., 58, 87)
        x = img[..., None]            # channel last
        x = nn.Conv(32, (5, 5), padding="VALID")(x)          # (54, 83, 32)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))           # (27, 41, 32)
        x = nn.elu(x)
        x = nn.Conv(64, (3, 3), padding="VALID")(x)          # (25, 39, 64)
        x = nn.elu(x)
        x = x.reshape(x.shape[:-3] + (-1,))
        x = nn.elu(nn.Dense(128)(x))
        x = nn.Dense(self.output_dim)(x)
        return jnp.tanh(x) if self.output_activation == "tanh" else nn.elu(x)


class RecurrentDepthEncoder(nn.Module):
    """CNN + proprio-combine MLP + GRU(512) -> [latent 32 | dyaw 2 |
    obstacle-type softmax 6] (reference depth_backbone.py:7-46)."""
    n_latent: int = 32
    n_delta_yaw: int = 2
    n_obst_type: int = 6
    n_proprio: int = 65
    hidden: int = 512

    def setup(self):
        self.backbone = DepthBackbone58x87(self.n_latent, name="backbone")
        self.combine = nn.Sequential(
            [nn.Dense(128), nn.elu, nn.Dense(self.n_latent)], name="combine")
        self.gru = nn.GRUCell(features=self.hidden, name="gru")
        self.out = nn.Dense(self.n_latent + self.n_delta_yaw + self.n_obst_type,
                            name="out")

    def __call__(self, depth, prop, hidden):
        """depth (N, 58, 87), prop (N, n_proprio), hidden (N, 512)."""
        feat = self.backbone(depth)
        lat = self.combine(jnp.concatenate([feat, prop], axis=-1))
        hidden, y = self.gru(hidden, lat)
        o = self.out(y)
        lat_out = o[:, : self.n_latent + self.n_delta_yaw]
        types = jax.nn.softmax(o[:, self.n_latent + self.n_delta_yaw :], axis=-1)
        return jnp.concatenate([lat_out, types], axis=-1), hidden

    def init_hidden(self, n):
        return jnp.zeros((n, self.hidden))

    def embed_image(self, depth):
        return self.backbone(depth)


class StackDepthEncoder(nn.Module):
    """Frame-stack depth encoder (reference depth_backbone.py:48-73):
    per-frame CNN latents + proprio combine + temporal conv1d.  Registered
    for capability parity; the training path uses RecurrentDepthEncoder."""
    n_latent: int = 32
    n_proprio: int = 65
    buffer_len: int = 2

    @nn.compact
    def __call__(self, depth_stack, prop):
        # depth_stack (N, buf, H, W)
        N, B = depth_stack.shape[:2]
        feat = DepthBackbone58x87(self.n_latent)(
            depth_stack.reshape((N * B,) + depth_stack.shape[2:]))
        feat = feat.reshape(N, B, -1)
        comb = nn.Sequential([nn.Dense(128), nn.elu, nn.Dense(self.n_latent)])
        feat = comb(jnp.concatenate(
            [feat, jnp.repeat(prop[:, None], B, axis=1)], axis=-1))
        x = nn.elu(nn.Conv(16, (4,), strides=(2,), padding="SAME")(feat))
        x = nn.elu(nn.Conv(16, (2,), padding="SAME")(x))
        x = x.reshape(N, -1)
        return nn.elu(nn.Dense(self.n_latent)(x))


# ---------------------------------------------------------------------------
# BYOL (reference byol.py, lucidrains-derived; defaults: projection 256,
# hidden 4096, EMA decay 0.99)
# ---------------------------------------------------------------------------


class _ProjectorMLP(nn.Module):
    projection: int = 256
    hidden: int = 4096

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden)(x)
        x = nn.relu(nn.BatchNorm(use_running_average=True)(x))
        return nn.Dense(self.projection)(x)


class BYOLNets(nn.Module):
    """Online path: backbone -> projector -> predictor; the target path uses
    EMA'd copies of (backbone, projector)."""
    n_latent: int = 32

    def setup(self):
        self.backbone = DepthBackbone58x87(self.n_latent, name="backbone")
        self.projector = _ProjectorMLP(name="projector")
        self.predictor = _ProjectorMLP(name="predictor")

    def project(self, img):
        return self.projector(self.backbone(img))

    def __call__(self, img):
        return self.predictor(self.project(img))


class BYOLState(NamedTuple):
    online: Any       # BYOLNets params (backbone+projector+predictor)
    target: Any       # EMA copy (backbone+projector used)
    ema_decay: jnp.ndarray   # () strong f32 (stable jit signature)


def byol_init(key, n_latent=32, image_shape=(58, 87)) -> Tuple[BYOLNets, BYOLState]:
    net = BYOLNets(n_latent=n_latent)
    params = net.init(key, jnp.zeros((1,) + image_shape))
    return net, BYOLState(online=params, target=jax.tree.map(jnp.copy, params),
                          ema_decay=jnp.asarray(0.99, jnp.float32))


def byol_loss(net: BYOLNets, online_params, target_params, img1, img2):
    """Symmetric cosine loss (byol.py:290-310)."""

    def cos_loss(p, z):
        p = p / (jnp.linalg.norm(p, axis=-1, keepdims=True) + 1e-8)
        z = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-8)
        return 2.0 - 2.0 * jnp.sum(p * z, axis=-1)

    p1 = net.apply(online_params, img1)
    p2 = net.apply(online_params, img2)
    z1 = jax.lax.stop_gradient(net.apply(target_params, img1, method="project"))
    z2 = jax.lax.stop_gradient(net.apply(target_params, img2, method="project"))
    return jnp.mean(cos_loss(p1, z2) + cos_loss(p2, z1))


def byol_ema_update(state: BYOLState) -> BYOLState:
    new_target = jax.tree.map(
        lambda t, o: t * state.ema_decay + o * (1 - state.ema_decay),
        state.target, state.online)
    return state._replace(target=new_target)


# ---------------------------------------------------------------------------
# depth augmentations (byol.py:198-248)
# ---------------------------------------------------------------------------


def _background_noise(key, img):
    h, w = img.shape
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    ah = jax.random.randint(k1, (), 1, h // 4)
    aw = jax.random.randint(k2, (), 1, w // 4)
    x0 = jax.random.randint(k3, (), 0, 3 * h // 4)
    y0 = jax.random.randint(k4, (), 0, 3 * w // 4)
    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]
    mask = (rows >= x0) & (rows < x0 + ah) & (cols >= y0) & (cols < y0 + aw)
    noise = jax.random.uniform(k5, img.shape) - 0.5
    return jnp.where(mask, noise, img)


def augment_depth(key, img):
    """Randomly-applied depth augmentations for one image (58, 87)."""
    ks = jax.random.split(key, 8)
    apply = lambda k, p: jax.random.uniform(k) < p

    img = jnp.where(apply(ks[0], 0.1), _background_noise(ks[1], img), img)
    img = jnp.where(apply(ks[2], 0.1),
                    img + jax.random.normal(ks[3], img.shape) * 0.02, img)
    img = jnp.where(apply(ks[4], 0.05),
                    img * (jax.random.uniform(ks[5], img.shape) > 0.05), img)
    # 3x3 box blur as the gaussian-blur stand-in
    blurred = jnp.pad(img, 1, mode="edge")
    blurred = sum(
        blurred[dx : dx + img.shape[0], dy : dy + img.shape[1]]
        for dx in range(3) for dy in range(3)) / 9.0
    img = jnp.where(apply(ks[6], 0.1), blurred, img)
    return img
