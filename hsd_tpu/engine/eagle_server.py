"""Continuous batching for the EAGLE engine: a slot pool where each engine
step runs ONE eagenerate block (head absorb -> beam trie -> tree-masked
target forward -> trie verify -> path compaction) for every active slot,
vmapped, while a host scheduler admits queued prompts as requests finish.

The reference has no serving at all (its eagenerate is single-request,
ea_model.py:194-366); this is the trie-drafting twin of
`engine.server.SlotEngine` (same host scheduler shape: NO device-synced
occupancy reads, batched admission prefill in one program, donated pool
state, OOB-dropped scatter padding rows, per-request budgets/telemetry).
The single-slot math is shared with `make_eagle_generate` through
`eagle_engine.make_eagle_block`, so the greedy invariant (greedy EAGLE ==
target AR greedy) holds per slot and is pinned in tests/test_eagle_server.
"""
from __future__ import annotations

import dataclasses
import time
from collections import deque
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig, ModelConfig
from ..models.eagle import EagleConfig
from .eagle_engine import make_eagle_block, make_eagle_pool


@dataclasses.dataclass
class Request:
    rid: int
    prompt: np.ndarray   # bucketed (left-padded)
    prompt_len: int
    max_new: int
    out_tokens: Optional[np.ndarray] = None
    accepts: int = 0     # accepted drafted tokens (telemetry)
    blocks: int = 0


class EagleSlotEngine:
    """Host-side continuous-batching scheduler around the EAGLE pool block.
    mode in {'greedy', 'typical', 'hsd', 'hsd_ref'}.

    batched=True (default): the pool step runs ONE slot-batched target tree
    forward with per-row cache frontiers (`eagle_engine.make_eagle_pool`)
    so all slots share a single quantized-weight stream — the term that
    dominates the block at production geometry. batched=False keeps the
    original fully-vmapped per-slot block (one weight stream PER slot
    through the Pallas grid; retained for A/B measurement)."""

    def __init__(self, cfg_t: ModelConfig, ecfg: EagleConfig,
                 engine: EngineConfig, n_slots: int, bucket: int,
                 params_t=None, params_e=None, seed: int = 0,
                 admit_batch: int = 4, mode: str = "hsd",
                 target_forward=None, batched: bool = True,
                 steps_per_dispatch: int = 1):
        self.cfg_t, self.ecfg, self.engine = cfg_t, ecfg, engine
        self.n_slots, self.bucket = n_slots, bucket
        self.max_new = engine.max_new_tokens
        self.N = ecfg.total_tokens
        self.S = bucket + self.max_new + self.N + 2
        self.params_t, self.params_e = params_t, params_e
        self.key = jax.random.PRNGKey(seed)
        self.queue: deque[Request] = deque()
        self.running: Dict[int, Request] = {}
        self.slot_rid = [-1] * n_slots
        self.admit_batch = min(admit_batch, n_slots)
        self.eos = cfg_t.eos_token_id
        self.batched = batched
        # >1: run M pool blocks per jitted dispatch (lax.while_loop with an
        # all-done early exit; per-block keys derived ON DEVICE by fold_in).
        # Each dispatch of a ~200-leaf params pytree costs ~27 ms on the
        # relay backend (scripts/probe_dispatch_floor.py) — at M=1 that
        # floor rivals the 8B block compute itself. The trade: a slot
        # freed mid-macro waits up to M-1 blocks for admission.
        self.steps_per_dispatch = max(1, steps_per_dispatch)
        if self.steps_per_dispatch > 1 and not batched:
            raise ValueError("steps_per_dispatch>1 requires batched=True")
        self._prefill1, self._block1, _, _ = make_eagle_block(
            cfg_t, ecfg, engine, mode=mode, target_forward=target_forward)
        if batched:
            self._pool_block = make_eagle_pool(
                cfg_t, ecfg, engine, mode=mode,
                target_forward=target_forward)
        self._build()
        self.state = self._init_state()
        self.total_committed = 0
        self.step_time = 0.0

    # ---- jitted kernels ------------------------------------------------
    def _build(self):
        n_slots = self.n_slots
        block1 = self._block1
        prefill1 = self._prefill1

        def keep_for(active):
            def keep(new, old):
                return jax.tree.map(
                    lambda n_, o: jnp.where(
                        jnp.reshape(active,
                                    (n_slots,) + (1,) * (n_.ndim - 1)),
                        n_, o), new, old)
            return keep

        def pool_step(params_t, params_e, tokens, length, prompt_end,
                      slot_max_new, active, acc_sum, blk_cnt, tcache, ekv,
                      feat_buf, keys):
            def one(tok, ln, tc, ek, fb, k):
                return block1(params_t, params_e, tok, ln, tc, ek, fb, k)

            (tokens2, length2, acc_len, _plen, hit_eos, tcache2, ekv2,
             feat2) = jax.vmap(one)(tokens, length, tcache, ekv, feat_buf,
                                    keys)
            budget = length2 - prompt_end >= slot_max_new
            done2 = active & (hit_eos | budget)
            keep = keep_for(active)
            return (keep(tokens2, tokens), keep(length2, length), done2,
                    keep(acc_sum + acc_len, acc_sum),
                    keep(blk_cnt + 1, blk_cnt), keep(tcache2, tcache),
                    keep(ekv2, ekv), keep(feat2, feat_buf))

        def pool_step_batched(params_t, params_e, tokens, length, prompt_end,
                              slot_max_new, active, acc_sum, blk_cnt, tcache,
                              ekv, feat_buf, keys):
            (tokens2, length2, acc_len, _plen, hit_eos, tcache2, ekv2,
             feat2) = self._pool_block(params_t, params_e, tokens, length,
                                       tcache, ekv, feat_buf, keys)
            budget = length2 - prompt_end >= slot_max_new
            done2 = active & (hit_eos | budget)
            keep = keep_for(active)
            # cache/ekv/feat updates go UNMASKED: inactive rows hold
            # garbage only in their own slot row (lengths stay frozen by
            # the keep below, so writes land at a fixed frontier; scatter
            # positions past S are dropped), and admission overwrites the
            # whole row — masking them would cost a full pool-cache
            # read+write of `where` every step for nothing.
            return (keep(tokens2, tokens), keep(length2, length), done2,
                    keep(acc_sum + acc_len, acc_sum),
                    keep(blk_cnt + 1, blk_cnt), tcache2, ekv2, feat2)

        M = self.steps_per_dispatch

        def macro_step(params_t, params_e, tokens, length, prompt_end,
                       slot_max_new, active, acc_sum, blk_cnt, tcache, ekv,
                       feat_buf, base_key):
            """M pool blocks per dispatch. Slots that finish (eos/budget)
            are deactivated ON DEVICE so later iterations stop advancing
            them; exits early when every slot is done."""
            def cond(st):
                return (st[0] < M) & jnp.any(st[3])

            def body(st):
                (i, tokens, length, active, done_acc, acc_sum, blk_cnt,
                 tcache, ekv, feat_buf) = st
                ki = jax.random.fold_in(base_key, i)
                keys = jax.vmap(lambda s: jax.random.fold_in(ki, s))(
                    jnp.arange(n_slots))
                (tokens2, length2, acc_len, _plen, hit_eos, tcache, ekv,
                 feat_buf) = self._pool_block(params_t, params_e, tokens,
                                              length, tcache, ekv,
                                              feat_buf, keys)
                budget = length2 - prompt_end >= slot_max_new
                done2 = active & (hit_eos | budget)
                keep = keep_for(active)
                return (i + 1, keep(tokens2, tokens),
                        keep(length2, length), active & ~done2,
                        done_acc | done2, keep(acc_sum + acc_len, acc_sum),
                        keep(blk_cnt + 1, blk_cnt), tcache, ekv, feat_buf)

            st = (jnp.int32(0), tokens, length, active,
                  jnp.zeros_like(active), acc_sum, blk_cnt, tcache, ekv,
                  feat_buf)
            (_, tokens, length, _, done_acc, acc_sum, blk_cnt, tcache, ekv,
             feat_buf) = jax.lax.while_loop(cond, body, st)
            return (tokens, length, done_acc, acc_sum, blk_cnt, tcache,
                    ekv, feat_buf)

        self._step = jax.jit(
            macro_step if M > 1 else
            (pool_step_batched if self.batched else pool_step),
            donate_argnums=(2, 3, 7, 8, 9, 10, 11))

        def prefill_batch(params_t, params_e, prompts, prompt_lens, keys):
            """Batched admission prefill: one program per admission round
            (same rationale as server._prefill_batch)."""
            def one(p, n, k):
                tokens, length, tc, ek, fb, _ = prefill1(params_t, params_e,
                                                         p, n, k)
                return tokens, length, tc, ek, fb

            return jax.vmap(one)(prompts, prompt_lens, keys)

        self._prefill_batch = jax.jit(prefill_batch)

    def _init_state(self):
        # one throwaway prefill shapes the per-slot cache pytrees
        p0 = jnp.zeros((self.bucket,), jnp.int32)
        _, _, tc, ek, fb, _ = jax.eval_shape(
            lambda p, n, k: self._prefill1(self.params_t, self.params_e,
                                           p, n, k),
            p0, jnp.int32(1), jax.random.PRNGKey(0))
        zeros = lambda sd: jnp.zeros((self.n_slots,) + sd.shape, sd.dtype)
        if self.batched:
            # ONE batch-B cache (slot axis = the cache's own batch axis 1)
            # instead of a leading-slot-axis stack of B=1 caches: the pool
            # block's target forward takes it whole. N+1 extra tail slots
            # hold the STAGED tree block (make_eagle_pool docstring).
            from .kvcache import KVCache
            wide = lambda sd: jnp.zeros(
                (sd.shape[0], self.n_slots, sd.shape[2] + self.N + 1)
                + sd.shape[3:], sd.dtype)
            tcache = KVCache(k=wide(tc.k), v=wide(tc.v),
                             length=jnp.int32(0),
                             start=jnp.zeros((self.n_slots,), jnp.int32))
        else:
            tcache = jax.tree.map(zeros, tc)
        return dict(
            tokens=jnp.zeros((self.n_slots, self.S), jnp.int32),
            length=jnp.full((self.n_slots,), 2, jnp.int32),
            prompt_end=jnp.full((self.n_slots,), self.bucket, jnp.int32),
            max_new=jnp.full((self.n_slots,), self.max_new, jnp.int32),
            active=jnp.zeros((self.n_slots,), bool),
            done=jnp.zeros((self.n_slots,), bool),
            acc_sum=jnp.zeros((self.n_slots,), jnp.int32),
            blk_cnt=jnp.zeros((self.n_slots,), jnp.int32),
            tcache=tcache,
            ekv=jax.tree.map(zeros, ek),
            feat_buf=jax.tree.map(zeros, fb),
        )

    def submit(self, rid: int, prompt_ids: List[int], max_new: int = 0):
        ids = list(prompt_ids)[-self.bucket:]
        padded = np.asarray([0] * (self.bucket - len(ids)) + ids, np.int32)
        self.queue.append(Request(rid, padded, len(ids),
                                  max_new or self.max_new))

    def _admit(self):
        free = [s for s in range(self.n_slots) if self.slot_rid[s] == -1]
        while self.queue and free:
            batch = []
            while self.queue and free and len(batch) < self.admit_batch:
                req = self.queue.popleft()
                s = free.pop(0)
                batch.append((s, req))
                self.slot_rid[s] = req.rid
                self.running[req.rid] = req
            A = self.admit_batch
            prompts = np.stack([b[1].prompt for b in batch]
                               + [batch[-1][1].prompt] * (A - len(batch)))
            plens = np.asarray([b[1].prompt_len for b in batch]
                               + [batch[-1][1].prompt_len] * (A - len(batch)),
                               np.int32)
            self.key, kp = jax.random.split(self.key)
            keys = jax.random.split(kp, A)
            tokens_new, len_new, tc_new, ek_new, fb_new = self._prefill_batch(
                self.params_t, self.params_e, jnp.asarray(prompts),
                jnp.asarray(plens), keys)
            slots = np.full((A,), self.n_slots, np.int32)  # pad -> dropped
            slots[:len(batch)] = [b[0] for b in batch]
            mn = np.full((A,), self.max_new, np.int32)
            mn[:len(batch)] = [min(b[1].max_new, self.max_new)
                               for b in batch]
            st = self.state
            put = lambda buf, new: jax.tree.map(
                lambda b, n: b.at[jnp.asarray(slots)].set(n), buf, new)
            ii = jnp.asarray(slots)
            if self.batched:
                # slot axis of the pool cache is axis 1 ([L, B, S, H, D]);
                # each admitted request's B=1 cache row (S shorter by the
                # staging tail) zero-pads and scatters into it
                tc = st["tcache"]
                pad = ((0, 0), (0, 0), (0, self.N + 1), (0, 0), (0, 0))
                tcache = tc._replace(
                    k=tc.k.at[:, ii].set(jnp.moveaxis(
                        jnp.pad(tc_new.k[:, :, 0], pad), 0, 1)),
                    v=tc.v.at[:, ii].set(jnp.moveaxis(
                        jnp.pad(tc_new.v[:, :, 0], pad), 0, 1)),
                    start=tc.start.at[ii].set(tc_new.start[:, 0]),
                )
            else:
                tcache = put(st["tcache"], tc_new)
            self.state = dict(
                st,
                tokens=st["tokens"].at[ii].set(tokens_new),
                length=st["length"].at[ii].set(len_new),
                prompt_end=st["prompt_end"].at[ii].set(
                    jnp.full((A,), self.bucket, jnp.int32)),
                max_new=st["max_new"].at[ii].set(jnp.asarray(mn)),
                active=st["active"].at[ii].set(jnp.ones((A,), bool)),
                done=st["done"].at[ii].set(jnp.zeros((A,), bool)),
                acc_sum=st["acc_sum"].at[ii].set(jnp.zeros((A,), jnp.int32)),
                blk_cnt=st["blk_cnt"].at[ii].set(jnp.zeros((A,), jnp.int32)),
                tcache=tcache,
                ekv=put(st["ekv"], ek_new),
                feat_buf=put(st["feat_buf"], fb_new),
            )

    def _harvest(self) -> List[Request]:
        finished = []
        done = np.asarray(self.state["done"])
        if not done.any():
            return finished
        acc, blk, lengths, all_toks = jax.device_get(
            (self.state["acc_sum"], self.state["blk_cnt"],
             self.state["length"], self.state["tokens"]))
        for s in range(self.n_slots):
            if done[s] and self.slot_rid[s] >= 0:
                rid = self.slot_rid[s]
                req = self.running.pop(rid)
                ln = int(lengths[s])
                toks = all_toks[s][self.bucket:ln]
                if self.eos in toks.tolist():
                    toks = toks[:toks.tolist().index(self.eos) + 1]
                req.out_tokens = toks[:req.max_new]
                req.accepts = int(acc[s])
                req.blocks = int(blk[s])
                finished.append(req)
                st = self.state
                self.state = dict(
                    st,
                    active=st["active"].at[s].set(False),
                    done=st["done"].at[s].set(False))
                self.slot_rid[s] = -1
        return finished

    def step(self) -> List[Request]:
        t0 = time.perf_counter()
        self._admit()
        if all(r < 0 for r in self.slot_rid):
            return []
        self.key, k = jax.random.split(self.key)
        keys = (k if self.steps_per_dispatch > 1
                else jax.random.split(k, self.n_slots))
        st = self.state
        (tokens, length, done, acc_sum, blk_cnt, tcache, ekv, feat_buf) = \
            self._step(self.params_t, self.params_e, st["tokens"],
                       st["length"], st["prompt_end"], st["max_new"],
                       st["active"], st["acc_sum"], st["blk_cnt"],
                       st["tcache"], st["ekv"], st["feat_buf"], keys)
        self.state = dict(st, tokens=tokens, length=length,
                          done=st["done"] | done, acc_sum=acc_sum,
                          blk_cnt=blk_cnt, tcache=tcache, ekv=ekv,
                          feat_buf=feat_buf)
        out = self._harvest()
        self.step_time += time.perf_counter() - t0
        self.total_committed += sum(len(r.out_tokens) for r in out)
        return out

    def stats(self) -> Dict[str, float]:
        acc = np.asarray(self.state["acc_sum"], np.float64)
        blk = np.asarray(self.state["blk_cnt"], np.float64)
        be = float((acc.sum() + blk.sum()) / blk.sum()) if blk.sum() else 0.0
        tput = (self.total_committed / self.step_time
                if self.step_time else 0.0)
        return {"block_efficiency": be, "tokens_per_s": tput,
                "blocks": float(blk.sum()), "committed": self.total_committed}

    def run_all(self, max_steps: int = 10_000) -> List[Request]:
        out = []
        for _ in range(max_steps):
            out.extend(self.step())
            if not self.queue and not self.running:
                break
        return out
