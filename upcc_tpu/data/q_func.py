"""Continuous rate control: quality vector q -> loss weights lambda.

Parity target: /root/reference/data/q_func.py.  One (q_g, q_a) ~ U(0,1)^2
pair is drawn per training step and broadcast to the whole batch (the
paper's training scheme, q_func.py:41-42); the lambda map follows the
'quadratic' (q^2 * (max-min) + min) or 'exponential' (2^(q*a) + b) schedule.
"""

import jax
import jax.numpy as jnp


class QFunc:
    def __init__(self, config):
        self.mode = config["mode"]
        # corner-emphasis sampling (this repo's addition, off by default =
        # reference parity): with probability corner_p, each q component
        # snaps to an exact 0 or 1.  Under plain U(0,1)^2 the lambda~0
        # corner is measure-zero, so the rate-only operating point (q=0
        # must spend ~no bits) is the last thing the gain nets learn;
        # emphasizing the edges accelerates monotone rate response.
        self.corner_p = float(config.get("corner_p", 0.0))
        la_min, la_max = config["lambda_A_min"], config["lambda_A_max"]
        lg_min, lg_max = config["lambda_G_min"], config["lambda_G_max"]
        if self.mode == "exponential":
            self.a = jnp.array([jnp.log2(float(lg_max + lg_min)),
                                jnp.log2(float(la_max + la_min))], jnp.float32)
            self.b = jnp.array([lg_min - 1.0, la_min - 1.0], jnp.float32)
        elif self.mode == "quadratic":
            self.a = jnp.array([lg_max - lg_min, la_max - la_min], jnp.float32)
            self.b = jnp.array([lg_min, la_min], jnp.float32)
        else:
            raise ValueError(f"unknown q_map mode {self.mode}")

    def scale_q_vals(self, q):
        """q [..., 2] -> lambda [..., 2]."""
        if self.mode == "exponential":
            return 2.0 ** (q * self.a) + self.b
        return q * q * self.a + self.b

    def sample(self, rng, batch_size):
        """Draw one scalar q pair for the step, broadcast over the batch."""
        q = jax.random.uniform(rng, (1, 2), jnp.float32)
        if self.corner_p > 0.0:
            ks, kc = jax.random.split(rng)
            u = jax.random.uniform(ks, (1, 2), jnp.float32)
            corner = (jax.random.uniform(kc, (1, 2), jnp.float32)
                      < 0.5).astype(jnp.float32)
            q = jnp.where(u < self.corner_p, corner, q)
        q = jnp.tile(q, (batch_size, 1))
        return q, self.scale_q_vals(q)
