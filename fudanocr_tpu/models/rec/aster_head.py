"""ASTER-style attention recognition head (greedy + beam search).

Rebuild of scene-text-telescope/model/attention_recognition_head.py:10-181:
a GRU decoder attends over the (B, T, D) encoder feature sequence with a
Bahdanau-style additive attention unit (tanh(xW + sW) -> scalar), embeds
the previous symbol, and emits per-step class logits. The last class index
is used as <BOS> at step 0.

TPU-first: teacher-forced training is one `lax.scan` over the target steps;
greedy sampling is a fixed-length scan; beam search keeps the (B, K) beam
state in dense arrays with `top_k` + gather (no Python data-dependent
control flow), mirroring the reference's inflate/backtrack algorithm.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


class ASTERAttentionHead(nn.Module):
    num_classes: int           # includes <EOS>; index num_classes = <BOS>
    in_planes: int = 512
    s_dim: int = 512
    att_dim: int = 512
    max_len: int = 100
    dtype: Optional[Dtype] = None

    def setup(self):
        # all step-loop weights are raw matrices (not submodules) so the
        # decode steps can run inside lax.scan without lifted transforms
        init = nn.initializers.lecun_normal()
        self.x_embed_w = self.param("xEmbed_w", init,
                                    (self.in_planes, self.att_dim))
        self.x_embed_b = self.param("xEmbed_b", nn.initializers.zeros,
                                    (self.att_dim,))
        self.s_embed_w = self.param("sEmbed_w", init,
                                    (self.s_dim, self.att_dim))
        self.s_embed_b = self.param("sEmbed_b", nn.initializers.zeros,
                                    (self.att_dim,))
        self.w_embed_w = self.param("wEmbed_w", init, (self.att_dim, 1))
        self.w_embed_b = self.param("wEmbed_b", nn.initializers.zeros, (1,))
        self.tgt_table = self.param("tgt_embedding",
                                    nn.initializers.normal(0.01),
                                    (self.num_classes + 1, self.att_dim))
        # single-direction GRU cell params (torch gate order r,z,n)
        self.gru_wi = self.param("gru_wi", init,
                                 (self.in_planes + self.att_dim,
                                  3 * self.s_dim))
        self.gru_wh = self.param("gru_wh",
                                 nn.initializers.orthogonal(column_axis=0),
                                 (self.s_dim, 3 * self.s_dim))
        self.gru_bi = self.param("gru_bi", nn.initializers.zeros,
                                 (3 * self.s_dim,))
        self.gru_bh = self.param("gru_bh", nn.initializers.zeros,
                                 (3 * self.s_dim,))
        self.fc_w = self.param("fc_w", init, (self.s_dim, self.num_classes))
        self.fc_b = self.param("fc_b", nn.initializers.zeros,
                               (self.num_classes,))

    def x_embed(self, x):
        return x @ self.x_embed_w + self.x_embed_b

    def _attend(self, x: jax.Array, x_proj: jax.Array,
                state: jax.Array) -> jax.Array:
        s_proj = (state @ self.s_embed_w + self.s_embed_b)[:, None, :]
        e = (jnp.tanh(x_proj + s_proj) @ self.w_embed_w
             + self.w_embed_b)[..., 0]  # (B, T)
        alpha = jax.nn.softmax(e.astype(jnp.float32), axis=-1)
        return jnp.einsum("bt,btd->bd", alpha.astype(x.dtype), x)

    def _gru_step(self, inp: jax.Array, h: jax.Array) -> jax.Array:
        gx = inp @ self.gru_wi + self.gru_bi
        gh = h @ self.gru_wh + self.gru_bh
        xr, xz, xn = jnp.split(gx, 3, axis=-1)
        hr, hz, hn = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        return (1.0 - z) * n + z * h

    def _step(self, x, x_proj, state, y_prev):
        context = self._attend(x, x_proj, state)
        y_emb = self.tgt_table[y_prev]
        new_state = self._gru_step(
            jnp.concatenate([y_emb, context], axis=-1), state)
        return new_state @ self.fc_w + self.fc_b, new_state

    def __call__(self, x: jax.Array, targets: jax.Array) -> jax.Array:
        """Teacher-forced: (B, T, D) feats + (B, L) targets -> (B, L, C)."""
        b, l = targets.shape
        x_proj = self.x_embed(x)
        state0 = jnp.zeros((b, self.s_dim), x.dtype)
        bos = jnp.full((b,), self.num_classes, jnp.int32)
        y_inputs = jnp.concatenate([bos[:, None], targets[:, :-1]], axis=1)

        def scan_fn(state, y_prev):
            out, new_state = self._step(x, x_proj, state, y_prev)
            return new_state, out

        _, outs = jax.lax.scan(scan_fn, state0,
                               jnp.swapaxes(y_inputs, 0, 1))
        return jnp.swapaxes(outs, 0, 1)

    def sample(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Greedy decode -> (ids (B, max_len), scores (B, max_len))."""
        b = x.shape[0]
        x_proj = self.x_embed(x)
        state0 = jnp.zeros((b, self.s_dim), x.dtype)
        bos = jnp.full((b,), self.num_classes, jnp.int32)

        def scan_fn(carry, _):
            state, y_prev = carry
            out, new_state = self._step(x, x_proj, state, y_prev)
            probs = jax.nn.softmax(out.astype(jnp.float32), axis=-1)
            pred = jnp.argmax(probs, axis=-1).astype(jnp.int32)
            score = jnp.max(probs, axis=-1)
            return (new_state, pred), (pred, score)

        _, (ids, scores) = jax.lax.scan(scan_fn, (state0, bos), None,
                                        length=self.max_len)
        return jnp.swapaxes(ids, 0, 1), jnp.swapaxes(scores, 0, 1)

    def beam_search(self, x: jax.Array, beam_width: int, eos: int
                    ) -> Tuple[jax.Array, jax.Array]:
        """-> (best ids (B, max_len), best scores (B,))."""
        b, t, d = x.shape
        k = beam_width
        xk = jnp.repeat(x, k, axis=0)                 # (B*K, T, D)
        xk_proj = self.x_embed(xk)
        state0 = jnp.zeros((b * k, self.s_dim), x.dtype)
        y0 = jnp.full((b * k,), self.num_classes, jnp.int32)
        # only beam 0 of each batch element starts alive
        seq_scores0 = jnp.where(
            jnp.arange(b * k) % k == 0, 0.0, -jnp.inf).astype(jnp.float32)
        tokens0 = jnp.zeros((b * k, self.max_len), jnp.int32)
        pos = (jnp.arange(b) * k)[:, None]            # (B, 1)

        def scan_fn(carry, i):
            state, y_prev, seq_scores, tokens, finished = carry
            out, new_state = self._step(xk, xk_proj, state, y_prev)
            logp = jax.nn.log_softmax(out.astype(jnp.float32), axis=-1)
            # finished beams keep their score and re-emit eos
            step_scores = jnp.where(
                finished[:, None],
                jnp.where(jnp.arange(self.num_classes)[None, :] == eos,
                          0.0, -jnp.inf),
                logp)
            cand = seq_scores[:, None] + step_scores  # (B*K, C)
            cand = cand.reshape(b, k * self.num_classes)
            top_scores, top_idx = jax.lax.top_k(cand, k)  # (B, K)
            sym = (top_idx % self.num_classes).astype(jnp.int32)
            pred = top_idx // self.num_classes + pos      # (B, K) flat beam
            pred = pred.reshape(b * k)
            sym = sym.reshape(b * k)
            new_state = new_state[pred]
            new_tokens = tokens[pred]
            new_tokens = jax.lax.dynamic_update_slice(
                new_tokens, sym[:, None], (0, i))
            new_finished = finished[pred] | (sym == eos)
            return (new_state, sym, top_scores.reshape(b * k), new_tokens,
                    new_finished), None

        finished0 = jnp.zeros((b * k,), bool)
        (state, y, seq_scores, tokens, finished), _ = jax.lax.scan(
            scan_fn, (state0, y0, seq_scores0, tokens0, finished0),
            jnp.arange(self.max_len))
        seq_scores = seq_scores.reshape(b, k)
        best = jnp.argmax(seq_scores, axis=-1)
        tokens = tokens.reshape(b, k, self.max_len)
        best_tokens = jnp.take_along_axis(
            tokens, best[:, None, None], axis=1)[:, 0]
        best_scores = jnp.take_along_axis(seq_scores, best[:, None],
                                          axis=1)[:, 0]
        return best_tokens, best_scores
