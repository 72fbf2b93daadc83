"""Multi-layer LSTM + attention seq2seq, via ``lax.scan`` (TPU-friendly).

Replaces torch ``nn.LSTM`` / the attention decoder of the ablation model
(reference models/magnet_cnn_no_interaction.py:62-113).  torch parity:
gate order (i, f, g, o), all weights and biases ~ U(±1/sqrt(hidden)), and
torch's two separate bias vectors (b_ih + b_hh) folded into one initialized
as the sum of two such uniforms.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

from magnet_tpu.nn.core import Linear, torch_bias_init


def _lstm_uniform(hidden: int):
    bound = 1.0 / np.sqrt(hidden)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class LSTMCellT(fnn.Module):
    """One torch-style LSTM cell; carries (h, c)."""

    hidden: int

    @fnn.compact
    def __call__(self, carry, x):
        h, c = carry
        init = _lstm_uniform(self.hidden)
        w_ih = self.param("w_ih", init, (x.shape[-1], 4 * self.hidden))
        w_hh = self.param("w_hh", init, (self.hidden, 4 * self.hidden))
        b_ih = self.param("b_ih", init, (4 * self.hidden,))
        b_hh = self.param("b_hh", init, (4 * self.hidden,))
        z = x @ w_ih + h @ w_hh + b_ih + b_hh
        i, f, g, o = jnp.split(z, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        return (h_new, c_new), h_new


class LSTM(fnn.Module):
    """Multi-layer unidirectional LSTM over a (T, C) sequence (per-sample;
    vmap over batch).  Returns (outputs (T, hidden), (h, c) each
    (layers, hidden))."""

    hidden: int
    num_layers: int

    @fnn.compact
    def __call__(self, x, state=None):
        if state is None:
            h0 = jnp.zeros((self.num_layers, self.hidden), x.dtype)
            c0 = jnp.zeros((self.num_layers, self.hidden), x.dtype)
        else:
            h0, c0 = state
        hs, cs = [], []
        seq = x
        for layer in range(self.num_layers):
            cell = fnn.scan(
                LSTMCellT,
                variable_broadcast="params",
                split_rngs={"params": False},
            )(self.hidden, name=f"layer_{layer}")
            (h, c), seq = cell((h0[layer], c0[layer]), seq)
            hs.append(h)
            cs.append(c)
        return seq, (jnp.stack(hs), jnp.stack(cs))


class _AttnDecStep(fnn.Module):
    """One attention-decoder step; scanned over future steps."""

    hidden: int
    num_layers: int

    @fnn.compact
    def __call__(self, carry, _):
        inp, hidden, encoder_states = carry
        attn_1 = Linear(self.hidden, name="attn_1")
        attn_2 = fnn.Dense(
            1,
            use_bias=False,
            kernel_init=fnn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            name="attn_2",
        )
        dec = LSTM(self.hidden, self.num_layers, name="lstm_decoder")

        h, c = hidden
        hc = jnp.concatenate([h[-1], c[-1]], axis=-1)        # (2H,)
        hc = jnp.broadcast_to(
            hc[None, :], (encoder_states.shape[0], 2 * self.hidden)
        )
        scores = attn_2(jnp.tanh(attn_1(jnp.concatenate([hc, encoder_states], -1))))
        weights = jax.nn.softmax(scores[:, 0], axis=0)       # (T,)
        context = weights @ encoder_states                   # (H,)
        dec_in = jnp.concatenate([inp, context[None, :]], axis=-1)  # (1, 2H)
        out, hidden = dec(dec_in, hidden)
        return (out, hidden, encoder_states), out[0]


class AttnSeq2Seq(fnn.Module):
    """Encoder LSTM + attention decoder LSTM (reference
    magnet_cnn_no_interaction.py:84-113): alignment MLP over
    (h_last, c_last, encoder_states), softmax over time, context concat to
    the decoder input, autoregressive for ``future_step`` steps (as a
    ``lax.scan`` — the reference's python loop, no_interaction.py:108-111,
    would unroll the trace)."""

    hidden: int
    num_layers: int

    @fnn.compact
    def __call__(self, x, future_step: int, state=None):
        enc = LSTM(self.hidden, self.num_layers, name="lstm_encoder")
        encoder_states, hidden = enc(x, state)               # (T, H)
        inp = encoder_states[-1:]                            # (1, H)

        scan = fnn.scan(
            _AttnDecStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            length=future_step,
        )(self.hidden, self.num_layers, name="att_decoder")
        (inp, hidden, _), outs = scan((inp, hidden, encoder_states), None)
        return outs, hidden                                  # (future_step, H)
