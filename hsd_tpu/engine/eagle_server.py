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
        if batched and target_forward is not None:
            # the batched pool calls target_forward(params, tokens, cache,
            # attn_bias, positions, lengths=, staging_at=) — a 5-arg
            # single-request forward (e.g. parallel.tp.make_tp_eagle_forward)
            # would only fail at trace time with an opaque TypeError
            import inspect
            sig = inspect.signature(target_forward)
            names = set(sig.parameters)
            has_varkw = any(p.kind is inspect.Parameter.VAR_KEYWORD
                            for p in sig.parameters.values())
            if not has_varkw and not {"lengths", "staging_at"} <= names:
                raise ValueError(
                    "batched=True needs a slot-batched target_forward that "
                    "accepts lengths= and staging_at= kwargs (got parameters "
                    f"{sorted(names)}); pass batched=False for 5-arg "
                    "single-request forwards, or use a pool-aware forward "
                    "(e.g. parallel.tp.make_tp_eagle_pool_forward)")
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
        # on-device staging (M>1): persistent refill stock for the macro
        self._staged = None
        self._staged_rids: List[int] = []
        self._staged_n = 0
        self._staged_consumed = 0
        self._done_acc = 0
        self._done_blk = 0
        self.refilled_total = 0   # requests admitted via on-device refill

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

        A_stage = self.admit_batch
        bucket = self.bucket

        def macro_step(params_t, params_e, tokens, length, prompt_end,
                       slot_max_new, active, acc_sum, blk_cnt, tcache, ekv,
                       feat_buf, st_tokens, st_length, st_max_new, st_k,
                       st_v, st_start, st_ekv, st_fb, n_staged, consumed0,
                       base_key, stop_on_free):
            """M pool blocks per dispatch with ON-DEVICE SLOT REFILL (the
            same scheme as server.SlotEngine.macro_step: staged prefilled
            requests consumed in entry order; a freed slot snapshots its
            finishing request into per-entry harvest buffers and takes the
            next staged request in the same iteration — no admission
            latency, no per-completion dispatch). st_k/st_v are staged
            cache rows already padded to the pool's wide seq axis with the
            slot axis at 1 ([L, A, S_wide, H, D] — the pool cache layout).
            Exits early only when every slot is done, or when a slot frees
            with the staging stock exhausted while the host still has
            queued requests (stop_on_free)."""
            def cond(st):
                (i, _tok, _len, active, done_now, _mn, _acc, _blk, _tc,
                 _ek, _fb, consumed, _asg, _ht, _hl, _ha, _hb) = st
                starve = stop_on_free & jnp.any(done_now) & \
                    (consumed >= n_staged)
                return (i < M) & jnp.any(active) & ~starve

            def body(st):
                (i, tokens, length, active, done_now, slot_mn, acc_sum,
                 blk_cnt, tcache, ekv, feat_buf, consumed, assigned,
                 h_tokens, h_length, h_acc, h_blk) = st
                ki = jax.random.fold_in(base_key, i)
                keys = jax.vmap(lambda s: jax.random.fold_in(ki, s))(
                    jnp.arange(n_slots))
                (tokens2, length2, acc_len, _plen, hit_eos, tcache, ekv,
                 feat_buf) = self._pool_block(params_t, params_e, tokens,
                                              length, tcache, ekv,
                                              feat_buf, keys)
                budget = length2 - prompt_end >= slot_mn
                done2 = active & (hit_eos | budget)
                keep = keep_for(active)
                tokens = keep(tokens2, tokens)
                length = keep(length2, length)
                acc_sum = keep(acc_sum + acc_len, acc_sum)
                blk_cnt = keep(blk_cnt + 1, blk_cnt)
                # ---- on-device refill of freed slots ----
                freed = done2
                rank = jnp.cumsum(freed.astype(jnp.int32)) - 1
                entry = consumed + rank
                can = freed & (entry < n_staged)
                idx_h = jnp.where(can, entry, A_stage)  # OOB pad: dropped
                h_tokens = h_tokens.at[idx_h].set(tokens)
                h_length = h_length.at[idx_h].set(length)
                h_acc = h_acc.at[idx_h].set(acc_sum)
                h_blk = h_blk.at[idx_h].set(blk_cnt)
                assigned = assigned.at[idx_h].set(
                    jnp.arange(n_slots, dtype=jnp.int32))
                e = jnp.clip(entry, 0, A_stage - 1)

                def merge(slot_leaf, staged_leaf, axis=0):
                    g = jnp.take(staged_leaf, e, axis=axis)
                    shape = [1] * g.ndim
                    shape[axis] = n_slots
                    return jnp.where(jnp.reshape(can, shape), g, slot_leaf)

                tokens = merge(tokens, st_tokens)
                length = jnp.where(can, jnp.take(st_length, e), length)
                slot_mn = jnp.where(can, jnp.take(st_max_new, e), slot_mn)
                acc_sum = jnp.where(can, 0, acc_sum)
                blk_cnt = jnp.where(can, 0, blk_cnt)
                tcache = tcache._replace(
                    k=merge(tcache.k, st_k, axis=1),
                    v=merge(tcache.v, st_v, axis=1),
                    start=jnp.where(can, jnp.take(st_start, e),
                                    tcache.start))
                ekv = jax.tree.map(merge, ekv, st_ekv)
                feat_buf = jax.tree.map(merge, feat_buf, st_fb)
                consumed = consumed + jnp.sum(can.astype(jnp.int32))
                return (i + 1, tokens, length, (active & ~done2) | can,
                        (done_now | done2) & ~can, slot_mn, acc_sum,
                        blk_cnt, tcache, ekv, feat_buf, consumed, assigned,
                        h_tokens, h_length, h_acc, h_blk)

            st = (jnp.int32(0), tokens, length, active,
                  jnp.zeros_like(active), slot_max_new, acc_sum, blk_cnt,
                  tcache, ekv, feat_buf, consumed0,
                  jnp.full((A_stage,), -1, jnp.int32),
                  jnp.zeros((A_stage, self.S), jnp.int32),
                  jnp.zeros((A_stage,), jnp.int32),
                  jnp.zeros((A_stage,), jnp.int32),
                  jnp.zeros((A_stage,), jnp.int32))
            (_, tokens, length, active, done_now, slot_mn, acc_sum,
             blk_cnt, tcache, ekv, feat_buf, consumed, assigned, h_tokens,
             h_length, h_acc, h_blk) = jax.lax.while_loop(cond, body, st)
            return (tokens, length, active, done_now, slot_mn, acc_sum,
                    blk_cnt, tcache, ekv, feat_buf, consumed, assigned,
                    h_tokens, h_length, h_acc, h_blk)

        self._step = jax.jit(
            macro_step if M > 1 else
            (pool_step_batched if self.batched else pool_step),
            donate_argnums=(2, 3, 7, 8, 9, 10, 11))

        def clear_slots(state_active, state_done, state_acc, state_blk,
                        mask):
            keep = ~mask
            return (state_active & keep, state_done & keep,
                    jnp.where(mask, 0, state_acc),
                    jnp.where(mask, 0, state_blk))

        self._clear_slots = jax.jit(clear_slots,
                                    donate_argnums=(0, 1, 2, 3))

        def prefill_batch(params_t, params_e, prompts, prompt_lens, keys):
            """Batched admission prefill: one program per admission round
            (same rationale as server._prefill_batch)."""
            def one(p, n, k):
                tokens, length, tc, ek, fb, _ = prefill1(params_t, params_e,
                                                         p, n, k)
                return tokens, length, tc, ek, fb

            return jax.vmap(one)(prompts, prompt_lens, keys)

        self._prefill_batch = jax.jit(prefill_batch)

        def prep_staged(tc_new):
            """Transform freshly-prefilled B=1 cache rows ([A, L, 1, S0,
            H, D]) into the pool layout the macro's refill merge expects:
            [L, A, S_wide, H, D], zero-padded by the staging tail."""
            pad = ((0, 0), (0, 0), (0, self.N + 1), (0, 0), (0, 0))
            st_k = jnp.moveaxis(jnp.pad(tc_new.k[:, :, 0], pad), 0, 1)
            st_v = jnp.moveaxis(jnp.pad(tc_new.v[:, :, 0], pad), 0, 1)
            return st_k, st_v, tc_new.start[:, 0]

        self._prep_staged = jax.jit(prep_staged)

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

    def _empty_staged(self):
        A = self.admit_batch
        tc = self.state["tcache"]
        zrow = lambda leaf: jnp.zeros((A,) + leaf.shape[1:], leaf.dtype)
        st_k = jnp.zeros(tc.k.shape[:1] + (A,) + tc.k.shape[2:], tc.k.dtype)
        st_v = jnp.zeros(tc.v.shape[:1] + (A,) + tc.v.shape[2:], tc.v.dtype)
        return (jnp.zeros((A, self.S), jnp.int32),
                jnp.zeros((A,), jnp.int32), jnp.zeros((A,), jnp.int32),
                st_k, st_v, jnp.zeros((A,), jnp.int32),
                jax.tree.map(zrow, self.state["ekv"]),
                jax.tree.map(zrow, self.state["feat_buf"]))

    def _stage(self):
        """Prefill up to admit_batch queued requests into the on-device
        refill stock (consumed in entry order; re-filled only when fully
        consumed — same policy as server.SlotEngine._stage)."""
        if self.steps_per_dispatch <= 1 or not self.queue:
            return
        if self._staged_consumed < self._staged_n:
            return
        A = self.admit_batch
        batch: List[Request] = []
        while self.queue and len(batch) < A:
            req = self.queue.popleft()
            batch.append(req)
            self.running[req.rid] = req
        prompts = np.stack([b.prompt for b in batch]
                           + [batch[-1].prompt] * (A - len(batch)))
        plens = np.asarray([b.prompt_len for b in batch]
                           + [batch[-1].prompt_len] * (A - len(batch)),
                           np.int32)
        self.key, kp = jax.random.split(self.key)
        keys = jax.random.split(kp, A)
        tokens_new, len_new, tc_new, ek_new, fb_new = self._prefill_batch(
            self.params_t, self.params_e, jnp.asarray(prompts),
            jnp.asarray(plens), keys)
        st_k, st_v, st_start = self._prep_staged(tc_new)
        mn = np.full((A,), self.max_new, np.int32)
        mn[:len(batch)] = [min(b.max_new, self.max_new) for b in batch]
        self._staged = (tokens_new, len_new, jnp.asarray(mn), st_k, st_v,
                        st_start, ek_new, fb_new)
        self._staged_rids = [b.rid for b in batch]
        self._staged_n = len(batch)
        self._staged_consumed = 0

    def _admit_staged_to_free(self):
        """Leftover staged stock + free slots at a step boundary: scatter
        the prefilled entries straight into slots (rare fallback; keeps
        staged requests from deadlocking when no active slot will free)."""
        if self._staged_consumed >= self._staged_n:
            return
        free = [s for s in range(self.n_slots) if self.slot_rid[s] == -1]
        if not free:
            return
        A = self.admit_batch
        (st_tokens, st_length, st_mn, st_k, st_v, st_start, st_ekv,
         st_fb) = self._staged
        slots = np.full((A,), self.n_slots, np.int32)   # pad -> dropped
        for a in range(self._staged_consumed, self._staged_n):
            if not free:
                break
            s = free.pop(0)
            slots[a] = s
            self.slot_rid[s] = self._staged_rids[a]
            self._staged_consumed = a + 1
        ii = jnp.asarray(slots)
        st = self.state
        put = lambda buf, new: jax.tree.map(
            lambda b, n: b.at[ii].set(n), buf, new)
        tc = st["tcache"]
        self.state = dict(
            st,
            tokens=st["tokens"].at[ii].set(st_tokens),
            length=st["length"].at[ii].set(st_length),
            prompt_end=st["prompt_end"].at[ii].set(
                jnp.full((A,), self.bucket, jnp.int32)),
            max_new=st["max_new"].at[ii].set(st_mn),
            active=st["active"].at[ii].set(jnp.ones((A,), bool)),
            done=st["done"].at[ii].set(jnp.zeros((A,), bool)),
            acc_sum=st["acc_sum"].at[ii].set(jnp.zeros((A,), jnp.int32)),
            blk_cnt=st["blk_cnt"].at[ii].set(jnp.zeros((A,), jnp.int32)),
            tcache=tc._replace(k=tc.k.at[:, ii].set(st_k),
                               v=tc.v.at[:, ii].set(st_v),
                               start=tc.start.at[ii].set(st_start)),
            ekv=put(st["ekv"], st_ekv),
            feat_buf=put(st["feat_buf"], st_fb),
        )

    def _reconcile(self, consumed, assigned, h_tokens, h_length, h_acc,
                   h_blk) -> List[Request]:
        """Replay the macro's deterministic refill chain (entry order x
        slot order) to map each harvest snapshot to its request."""
        finished: List[Request] = []
        c1 = int(consumed)
        c0 = self._staged_consumed
        if c1 <= c0:
            return finished
        assigned, h_tokens, h_length, h_acc, h_blk = jax.device_get(
            (assigned, h_tokens, h_length, h_acc, h_blk))
        for a in range(c0, c1):
            s = int(assigned[a])
            req = self.running.pop(self.slot_rid[s])
            ln = int(h_length[a])
            toks = h_tokens[a][self.bucket:ln]
            tl = toks.tolist()
            if self.eos in tl:
                toks = toks[:tl.index(self.eos) + 1]
            req.out_tokens = toks[:req.max_new]
            req.accepts = int(h_acc[a])
            req.blocks = int(h_blk[a])
            self._done_acc += req.accepts
            self._done_blk += req.blocks
            finished.append(req)
            self.slot_rid[s] = self._staged_rids[a]
            self.refilled_total += 1
        self._staged_consumed = c1
        return finished

    def _harvest(self) -> List[Request]:
        finished = []
        done = np.asarray(self.state["done"])
        if not done.any():
            return finished
        acc, blk, lengths, all_toks = jax.device_get(
            (self.state["acc_sum"], self.state["blk_cnt"],
             self.state["length"], self.state["tokens"]))
        mask = np.zeros((self.n_slots,), bool)
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
                self._done_acc += req.accepts
                self._done_blk += req.blocks
                finished.append(req)
                mask[s] = True
                self.slot_rid[s] = -1
        if mask.any():
            st = self.state
            active, done_f, acc_f, blk_f = self._clear_slots(
                st["active"], st["done"], st["acc_sum"], st["blk_cnt"],
                jnp.asarray(mask))
            self.state = dict(st, active=active, done=done_f,
                              acc_sum=acc_f, blk_cnt=blk_f)
        return finished

    def step(self) -> List[Request]:
        t0 = time.perf_counter()
        self._admit_staged_to_free()
        self._admit()
        if all(r < 0 for r in self.slot_rid):
            self.step_time += time.perf_counter() - t0
            return []
        self._stage()
        self.key, k = jax.random.split(self.key)
        st = self.state
        if self.steps_per_dispatch > 1:
            if self._staged is None:
                self._staged = self._empty_staged()
            (tokens, length, active, done_now, slot_mn, acc_sum, blk_cnt,
             tcache, ekv, feat_buf, consumed, assigned, h_tokens, h_length,
             h_acc, h_blk) = self._step(
                self.params_t, self.params_e, st["tokens"], st["length"],
                st["prompt_end"], st["max_new"], st["active"],
                st["acc_sum"], st["blk_cnt"], st["tcache"], st["ekv"],
                st["feat_buf"], *self._staged,
                jnp.int32(self._staged_n),
                jnp.int32(self._staged_consumed), k,
                jnp.bool_(len(self.queue) > 0))
            self.state = dict(st, tokens=tokens, length=length,
                              max_new=slot_mn, active=active,
                              done=st["done"] | done_now, acc_sum=acc_sum,
                              blk_cnt=blk_cnt, tcache=tcache, ekv=ekv,
                              feat_buf=feat_buf)
            out = self._reconcile(consumed, assigned, h_tokens, h_length,
                                  h_acc, h_blk)
        else:
            keys = jax.random.split(k, self.n_slots)
            (tokens, length, done, acc_sum, blk_cnt, tcache, ekv,
             feat_buf) = self._step(
                self.params_t, self.params_e, st["tokens"], st["length"],
                st["prompt_end"], st["max_new"], st["active"],
                st["acc_sum"], st["blk_cnt"], st["tcache"], st["ekv"],
                st["feat_buf"], keys)
            self.state = dict(st, tokens=tokens, length=length,
                              done=st["done"] | done, acc_sum=acc_sum,
                              blk_cnt=blk_cnt, tcache=tcache, ekv=ekv,
                              feat_buf=feat_buf)
            out = []
        out.extend(self._harvest())
        self.step_time += time.perf_counter() - t0
        self.total_committed += sum(len(r.out_tokens) for r in out)
        return out

    def stats(self) -> Dict[str, float]:
        acc = float(np.asarray(self.state["acc_sum"], np.float64).sum()) \
            + self._done_acc
        blk = float(np.asarray(self.state["blk_cnt"], np.float64).sum()) \
            + self._done_blk
        be = (acc + blk) / blk if blk else 0.0
        tput = (self.total_committed / self.step_time
                if self.step_time else 0.0)
        return {"block_efficiency": be, "tokens_per_s": tput,
                "blocks": blk, "committed": self.total_committed}

    def run_all(self, max_steps: int = 10_000) -> List[Request]:
        out = []
        for _ in range(max_steps):
            out.extend(self.step())
            if not self.queue and not self.running:
                break
        return out
