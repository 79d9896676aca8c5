"""Actor-critic networks for dict observations (proprio + tactile vision).

Topology mirrors the reference's skrl model instantiator config
(reference source/tacex_tasks/.../agents/skrl_ppo_tactile_rgb_cfg.yaml):
vision -> conv(16, k4, s2) -> conv(4, k3, s1) -> flatten -> concat(proprio)
-> MLP [256, 128, 64] (elu) -> gaussian policy head / value head. Flax is
NHWC-native, so no permute is needed (the YAML itself warns torch-only).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class VisionEncoder(nn.Module):
    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, H, W, C)
        x = nn.relu(nn.Conv(16, (4, 4), strides=(2, 2), padding="VALID")(x))
        x = nn.relu(nn.Conv(4, (3, 3), strides=(1, 1), padding="VALID")(x))
        return x.reshape((x.shape[0], -1))


class ActorCritic(nn.Module):
    """Gaussian actor + value critic over dict obs.

    ``shared_trunk=False`` (default) gives the policy and value separate
    towers: with a shared trunk, policy-loss gradients perturb the features
    the critic reads, which (with KL-adaptive LR raising the step size when
    the policy is stable) can run the critic away from its bootstrapped
    targets. Separate towers are the standard robust choice.
    """

    action_dim: int
    hidden: tuple = (256, 128, 64)
    initial_log_std: float = 0.0
    min_log_std: float = -20.0
    max_log_std: float = 2.0
    shared_trunk: bool = False

    def _features(self, obs):
        feats = []
        if "vision_obs" in obs:
            feats.append(VisionEncoder()(obs["vision_obs"]))
        feats.append(obs["proprio_obs"])
        return jnp.concatenate(feats, axis=-1)

    def _tower(self, x):
        for h in self.hidden:
            x = nn.elu(nn.Dense(h)(x))
        return x

    @nn.compact
    def __call__(self, obs: dict[str, jax.Array]):
        x = self._features(obs)
        pol = self._tower(x)
        val = pol if self.shared_trunk else self._tower(self._features(obs))
        mean = nn.Dense(self.action_dim, kernel_init=nn.initializers.orthogonal(0.01))(pol)
        log_std = self.param(
            "log_std", nn.initializers.constant(self.initial_log_std), (self.action_dim,)
        )
        log_std = jnp.clip(log_std, self.min_log_std, self.max_log_std)
        value = nn.Dense(1, kernel_init=nn.initializers.orthogonal(1.0))(val)[..., 0]
        return mean, jnp.broadcast_to(log_std, mean.shape), value


def gaussian_log_prob(mean: jax.Array, log_std: jax.Array, action: jax.Array) -> jax.Array:
    var = jnp.exp(2 * log_std)
    lp = -0.5 * ((action - mean) ** 2 / var + 2 * log_std + jnp.log(2 * jnp.pi))
    return lp.sum(axis=-1)


def gaussian_entropy(log_std: jax.Array) -> jax.Array:
    return (log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e)).sum(axis=-1)
