"""Continuous batching: slot-based multi-request speculative serving.

The north-star serving shape (BASELINE.json config 3): a fixed pool of
request slots decodes in lockstep — each engine step runs ONE speculative
block (draft scan -> target forward -> verify -> commit/rollback) for every
active slot, vmapped — while a host-side scheduler admits queued prompts
into slots as requests finish. New-request prefill writes straight into the
slot's cache rows, so admission never stalls the running batch beyond one
step boundary. Finished slots are masked (their step work is wasted but
shapes stay static — the standard TPU trade).

Layout: caches carry a leading slot axis via vmap; each slot owns K draft
rows (multidraft). All jitted pieces are per-bucket static shapes.
"""
from __future__ import annotations

import dataclasses
from collections import deque
from typing import Callable, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig, ModelConfig
from ..models import transformer
from ..ops.sampling import process_logits, processor
from ..verify import verify
from .kvcache import KVCache, init_cache, rollback, select_draft_row
from .speculative import _draft_block


class SlotState(NamedTuple):
    tokens: jax.Array    # [SLOTS, S] committed tokens
    length: jax.Array    # [SLOTS]
    prompt_end: jax.Array  # [SLOTS] prompt region end (P bucket)
    active: jax.Array    # [SLOTS] bool
    done: jax.Array      # [SLOTS] bool (finished, awaiting harvest)
    dcache: KVCache      # leading slot axis on batch dim handled via vmap
    tcache: KVCache


@dataclasses.dataclass
class Request:
    rid: int
    prompt: np.ndarray   # already bucketed (left-padded)
    prompt_len: int
    max_new: int
    out_tokens: Optional[np.ndarray] = None


class SlotEngine:
    """Host-side continuous-batching scheduler around jitted slot kernels."""

    def __init__(self, cfg_d: ModelConfig, cfg_t: ModelConfig,
                 engine: EngineConfig, n_slots: int, bucket: int,
                 params_d=None, params_t=None, seed: int = 0):
        self.cfg_d, self.cfg_t, self.engine = cfg_d, cfg_t, engine
        self.n_slots = n_slots
        self.bucket = bucket
        v = engine.verifier
        self.gamma, self.K = v.gamma, v.num_drafts
        self.method = v.method
        self.S = bucket + engine.max_new_tokens + self.gamma + 2
        self.params_d, self.params_t = params_d, params_t
        self.key = jax.random.PRNGKey(seed)
        self.queue: deque[Request] = deque()
        self.running: Dict[int, Request] = {}
        self.slot_rid = [-1] * n_slots
        self._build()
        self.state = self._init_state()

    # ---- jitted kernels ------------------------------------------------
    def _build(self):
        cfg_d, cfg_t = self.cfg_d, self.cfg_t
        gamma, K, S = self.gamma, self.K, self.S
        temp = processor(self.engine.temperature, self.engine.top_k,
                         self.engine.top_p)
        method = self.method
        eos = cfg_t.eos_token_id
        max_new = self.engine.max_new_tokens

        def slot_block(tokens, length, prompt_end, active, dcache, tcache,
                       key):
            """One speculative block for one slot (masked by `active`)."""
            kd, kv = jax.random.split(key)
            last = tokens[length - 1]
            draft_toks, q, dcache2 = _draft_block(
                cfg_d, self.params_d, dcache, tokens[length - 2], last, kd,
                gamma, temp)
            tgt_in = jnp.concatenate(
                [jnp.broadcast_to(last, (K, 1)).astype(jnp.int32),
                 draft_toks], 1)
            tlogits, tcache2 = transformer.forward(cfg_t, self.params_t,
                                                   tgt_in, tcache)
            p = temp(tlogits)
            res = verify(method, kv, draft_toks, q, p, num_drafts=K)
            n_commit = res.n_matches + 1
            posn = jnp.arange(S)
            src = jnp.take(res.tokens, jnp.clip(posn - length, 0, gamma))
            write = (posn >= length) & (posn < length + n_commit)
            tokens2 = jnp.where(write, src, tokens)
            new_length = length + n_commit
            dcache2 = rollback(dcache2, new_length - 2)
            tcache2 = rollback(tcache2, new_length - 1)
            if K > 1:
                dcache2 = select_draft_row(dcache2, res.draft_index)
                tcache2 = select_draft_row(tcache2, res.draft_index)
            hit_eos = jnp.any(write & (tokens2 == eos))
            budget = new_length - prompt_end >= max_new
            done = hit_eos | budget

            # masked fold: inactive slots keep their state untouched
            def keep(new, old):
                return jax.tree.map(
                    lambda n_, o: jnp.where(
                        jnp.reshape(active, (1,) * n_.ndim) if n_.ndim
                        else active, n_, o), new, old)

            tokens3 = jnp.where(active, tokens2, tokens)
            length3 = jnp.where(active, new_length, length)
            done3 = active & done
            dcache3 = keep(dcache2, dcache)
            tcache3 = keep(tcache2, tcache)
            return tokens3, length3, done3, dcache3, tcache3

        self._step = jax.jit(jax.vmap(slot_block))

        def prefill(prompt, prompt_len):
            start = jnp.broadcast_to(self.bucket - prompt_len,
                                     (K,)).astype(jnp.int32)
            dcache = init_cache(cfg_d, K, S)._replace(start=start)
            tcache = init_cache(cfg_t, K, S)._replace(start=start)
            pk = jnp.broadcast_to(prompt[None, :], (K, self.bucket))
            _, dcache = transformer.forward(cfg_d, self.params_d, pk[:, :-2],
                                            dcache)
            _, tcache = transformer.forward(cfg_t, self.params_t, pk[:, :-1],
                                            tcache)
            tokens = jnp.zeros((S,), jnp.int32).at[:self.bucket].set(prompt)
            return tokens, dcache, tcache

        self._prefill = jax.jit(prefill)

    # ---- state management ---------------------------------------------
    def _init_state(self) -> SlotState:
        K, S = self.K, self.S
        dc = init_cache(self.cfg_d, K, S)
        tc = init_cache(self.cfg_t, K, S)
        stack = lambda c: jax.tree.map(
            lambda x: jnp.stack([x] * self.n_slots), c)
        return SlotState(
            tokens=jnp.zeros((self.n_slots, S), jnp.int32),
            length=jnp.full((self.n_slots,), 2, jnp.int32),
            prompt_end=jnp.full((self.n_slots,), self.bucket, jnp.int32),
            active=jnp.zeros((self.n_slots,), bool),
            done=jnp.zeros((self.n_slots,), bool),
            dcache=stack(dc), tcache=stack(tc))

    def submit(self, rid: int, prompt_ids: List[int], max_new: int = 0):
        ids = list(prompt_ids)[-self.bucket:]
        padded = np.asarray([0] * (self.bucket - len(ids)) + ids, np.int32)
        self.queue.append(Request(rid, padded, len(ids),
                                  max_new or self.engine.max_new_tokens))

    def _admit(self):
        for s in range(self.n_slots):
            if not self.queue:
                break
            if bool(self.state.active[s]) or self.slot_rid[s] >= 0:
                continue
            req = self.queue.popleft()
            tokens, dcache, tcache = self._prefill(
                jnp.asarray(req.prompt), jnp.int32(req.prompt_len))
            st = self.state
            put = lambda buf, new: jax.tree.map(
                lambda b, n: b.at[s].set(n), buf, new)
            self.state = st._replace(
                tokens=st.tokens.at[s].set(tokens),
                length=st.length.at[s].set(self.bucket),
                prompt_end=st.prompt_end.at[s].set(self.bucket),
                active=st.active.at[s].set(True),
                done=st.done.at[s].set(False),
                dcache=put(st.dcache, dcache),
                tcache=put(st.tcache, tcache))
            self.slot_rid[s] = req.rid
            self.running[req.rid] = req

    def _harvest(self) -> List[Request]:
        finished = []
        done = np.asarray(self.state.done)
        for s in range(self.n_slots):
            if done[s] and self.slot_rid[s] >= 0:
                rid = self.slot_rid[s]
                req = self.running.pop(rid)
                ln = int(self.state.length[s])
                toks = np.asarray(self.state.tokens[s])[self.bucket:ln]
                eos = self.cfg_t.eos_token_id
                if eos in toks.tolist():
                    toks = toks[:toks.tolist().index(eos) + 1]
                req.out_tokens = toks[:req.max_new]
                finished.append(req)
                st = self.state
                self.state = st._replace(
                    active=st.active.at[s].set(False),
                    done=st.done.at[s].set(False))
                self.slot_rid[s] = -1
        return finished

    def step(self) -> List[Request]:
        """Admit queued requests, run one speculative block for all active
        slots, harvest finished requests."""
        self._admit()
        if not bool(np.any(np.asarray(self.state.active))):
            return []
        self.key, k = jax.random.split(self.key)
        keys = jax.random.split(k, self.n_slots)
        st = self.state
        tokens, length, done, dcache, tcache = self._step(
            st.tokens, st.length, st.prompt_end, st.active, st.dcache,
            st.tcache, keys)
        self.state = st._replace(tokens=tokens, length=length,
                                 done=st.done | done, dcache=dcache,
                                 tcache=tcache)
        return self._harvest()

    def run_all(self, max_steps: int = 10_000) -> List[Request]:
        out = []
        for _ in range(max_steps):
            out.extend(self.step())
            if not self.queue and not self.running:
                break
        return out
