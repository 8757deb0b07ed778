"""Continuous batching: slot-based multi-request speculative serving.

The north-star serving shape (BASELINE.json config 3): a fixed pool of
request slots decodes in lockstep — each engine step runs ONE speculative
block (draft scan -> target forward -> verify -> commit/rollback) for every
active slot, vmapped — while a host-side scheduler admits queued prompts
into slots as requests finish. New-request prefill writes into a per-request
STAGING buffer (its own jitted program), and all admissions of a step land
in ONE donated scatter — the slot state is updated in place, never copied
per slot. Finished slots are masked (their step work is wasted but shapes
stay static — the standard TPU trade).

Layout: caches carry a leading slot axis via vmap; each slot owns R draft
rows (K parallel drafts, or the striped-tree layout 1 + gamma*(K-1) when
verifier.parallel=False — the same row semantics as engine/speculative.py).
All jitted pieces are static shapes; the scheduler holds NO device-synced
booleans (slot occupancy lives host-side in slot_rid).

Telemetry: per-slot accepted-token and block counters ride in SlotState;
`stats()` reports aggregate block efficiency and throughput, and each
harvested Request carries its own accepts/blocks.
"""
from __future__ import annotations

import dataclasses
import time
from collections import deque
from typing import Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig, ModelConfig
from ..models import transformer
from ..ops.sampling import processor
from ..verify import verify
from .kvcache import KVCache, init_cache, rollback, select_draft_row
from .speculative import _draft_block, _draft_block_striped


class SlotState(NamedTuple):
    tokens: jax.Array    # [SLOTS, S] committed tokens
    length: jax.Array    # [SLOTS]
    prompt_end: jax.Array  # [SLOTS] prompt region end (P bucket)
    max_new: jax.Array   # [SLOTS] per-REQUEST token budget (<= engine's):
    #                      the slot stops and frees EARLY when its own
    #                      request's budget is met — heterogeneous budgets
    #                      are where continuous batching beats lockstep
    active: jax.Array    # [SLOTS] bool
    done: jax.Array      # [SLOTS] bool (finished, awaiting harvest)
    acc_sum: jax.Array   # [SLOTS] int32 accepted drafted tokens (telemetry)
    blk_cnt: jax.Array   # [SLOTS] int32 speculative blocks run (telemetry)
    dcache: KVCache      # leading slot axis on batch dim handled via vmap
    tcache: KVCache


@dataclasses.dataclass
class Request:
    rid: int
    prompt: np.ndarray   # already bucketed (left-padded)
    prompt_len: int
    max_new: int
    out_tokens: Optional[np.ndarray] = None
    accepts: int = 0     # accepted drafted tokens (telemetry)
    blocks: int = 0      # speculative blocks consumed


class SlotEngine:
    """Host-side continuous-batching scheduler around jitted slot kernels.

    target_forward: optional SLOT-BATCHED target override
    `(params, tokens [SLOTS, R, T], cache-with-leading-slot-axis) ->
    (logits [SLOTS, R, T, V], cache)` — the serving twin of
    `make_generate(target_forward=...)`. The slot axis rides INSIDE the
    override (instead of vmapping it from outside) so shard_map targets
    compose: `parallel.tp.make_tp_server_forward` / `parallel.pp.
    make_pp_server_forward` run the whole pool's verify forward on local
    Megatron shards / pipe stages with one program. Prefill calls the same
    override with a singleton slot axis.
    target_cache_ops: optional per-slot `(init, rollback, select)` triple
    (same protocol as make_generate); the engine vmaps rollback/select over
    the slot axis and stacks init for the pool state.
    """

    def __init__(self, cfg_d: ModelConfig, cfg_t: ModelConfig,
                 engine: EngineConfig, n_slots: int, bucket: int,
                 params_d=None, params_t=None, seed: int = 0,
                 admit_batch: int = 4, target_forward=None,
                 target_cache_ops=None, steps_per_dispatch: int = 1):
        self.cfg_d, self.cfg_t, self.engine = cfg_d, cfg_t, engine
        # >1: run M speculative blocks per jitted dispatch (on-device
        # done-masking + all-done early exit) — the per-dispatch host cost
        # on the relay backend grows with the params-pytree leaf count
        # (scripts/probe_dispatch_floor.py) and rivals a small-model block.
        # Trade: a freed slot waits up to M-1 blocks for admission.
        self.steps_per_dispatch = max(1, steps_per_dispatch)
        self.n_slots = n_slots
        self.bucket = bucket
        v = engine.verifier
        self.gamma, self.K = v.gamma, v.num_drafts
        self.striped = (not v.parallel) and self.K > 1
        # cache rows per slot (speculative.py:160-161 row layout)
        self.R = 1 + self.gamma * (self.K - 1) if self.striped else self.K
        self.method = v.method
        self.S = bucket + engine.max_new_tokens + self.gamma + 2
        self.params_d, self.params_t = params_d, params_t
        self.target_forward = target_forward
        self.target_cache_ops = target_cache_ops
        self.key = jax.random.PRNGKey(seed)
        self.queue: deque[Request] = deque()
        self.running: Dict[int, Request] = {}
        self.slot_rid = [-1] * n_slots
        self.admit_batch = min(admit_batch, n_slots)
        self._build()
        self.state = self._init_state()
        self.total_committed = 0
        self.step_time = 0.0
        # on-device staging (M>1): persistent buffers holding up to
        # admit_batch prefilled requests the macro refills slots from
        self._staged = None          # (tokens, max_new, dcache, tcache)
        self._staged_rids: List[int] = []
        self._staged_n = 0           # live entries
        self._staged_consumed = 0    # entries already consumed on device
        # host-side aggregate telemetry (survives slot reuse)
        self._done_acc = 0
        self._done_blk = 0
        self.refilled_total = 0   # requests admitted via on-device refill

    # ---- jitted kernels ------------------------------------------------
    def _build(self):
        cfg_d, cfg_t = self.cfg_d, self.cfg_t
        gamma, K, R, S = self.gamma, self.K, self.R, self.S
        n_slots = self.n_slots
        striped = self.striped
        temp = processor(self.engine.temperature, self.engine.top_k,
                         self.engine.top_p)
        method = self.method
        eos = cfg_t.eos_token_id
        max_new = self.engine.max_new_tokens

        # slot-batched target forward: default maps the slot axis with vmap
        # (params broadcast); shard_map overrides take the slot axis whole
        tfwd = self.target_forward or (
            lambda p, t, c: jax.vmap(
                lambda tt, cc: transformer.forward(cfg_t, p, tt, cc))(t, c))
        if self.target_cache_ops is None:
            t_init = lambda batch, max_len, start: init_cache(
                cfg_t, batch, max_len)._replace(start=start)
            t_rollback, t_select = rollback, select_draft_row
        else:
            t_init, t_rollback, t_select = self.target_cache_ops
        self._t_init = t_init

        def pool_step(params_d, params_t, tokens, length, prompt_end,
                      slot_max_new, active, acc_sum, blk_cnt, dcache,
                      tcache, keys):
            """One speculative block for every slot: vmapped draft scan ->
            ONE slot-batched target forward -> vmapped verify/commit.

            params ride as ARGUMENTS, never closure constants: closed-over
            weights embed into the serialized HLO and blow the remote
            compiler's request limit (HTTP 413) at real model sizes."""
            ks = jax.vmap(jax.random.split)(keys)       # [SLOTS, 2, 2]
            kd, kv = ks[:, 0], ks[:, 1]
            last = jax.vmap(lambda t, l: t[l - 1])(tokens, length)
            last2 = jax.vmap(lambda t, l: t[l - 2])(tokens, length)

            if striped:
                draft_one = lambda dc, l2, l1, k: _draft_block_striped(
                    cfg_d, params_d, dc, l2, l1, k, gamma, K, temp)
            else:
                draft_one = lambda dc, l2, l1, k: _draft_block(
                    cfg_d, params_d, dc, l2, l1, k, gamma, temp)
            draft_toks, q, dcache2 = jax.vmap(draft_one)(dcache, last2,
                                                         last, kd)

            tgt_in = jnp.concatenate(
                [jnp.broadcast_to(last[:, None, None],
                                  (n_slots, R, 1)).astype(jnp.int32),
                 draft_toks], axis=2)                   # [SLOTS, R, gamma+1]
            tlogits, tcache2 = tfwd(params_t, tgt_in, tcache)
            p = temp(tlogits)                           # [SLOTS, R, g+1, V]

            def verify_slot(kv_k, dt, q_s, p_s, tokens_s, length_s,
                            prompt_end_s, max_new_s, acc_s, blk_s, dc, tc):
                res = verify(method, kv_k, dt, q_s, p_s, num_drafts=K,
                             striped=striped)
                n_commit = res.n_matches + 1
                posn = jnp.arange(S)
                src = jnp.take(res.tokens,
                               jnp.clip(posn - length_s, 0, gamma))
                write = (posn >= length_s) & (posn < length_s + n_commit)
                tokens2 = jnp.where(write, src, tokens_s)
                new_length = length_s + n_commit
                dc = rollback(dc, new_length - 2)
                tc = t_rollback(tc, new_length - 1)
                if R > 1:
                    dc = select_draft_row(dc, res.draft_index)
                    tc = t_select(tc, res.draft_index)
                hit_eos = jnp.any(write & (tokens2 == eos))
                budget = new_length - prompt_end_s >= max_new_s
                return (tokens2, new_length, hit_eos | budget,
                        acc_s + res.n_matches, blk_s + 1, dc, tc)

            (tokens2, length2, done2, acc2, blk2, dcache3, tcache3) = \
                jax.vmap(verify_slot)(kv, draft_toks, q, p, tokens, length,
                                      prompt_end, slot_max_new, acc_sum,
                                      blk_cnt, dcache2, tcache2)

            # masked fold: inactive slots keep their state untouched
            def keep(new, old):
                return jax.tree.map(
                    lambda n_, o: jnp.where(
                        jnp.reshape(active,
                                    (n_slots,) + (1,) * (n_.ndim - 1)),
                        n_, o), new, old)

            return (keep(tokens2, tokens), keep(length2, length),
                    active & done2, keep(acc2, acc_sum),
                    keep(blk2, blk_cnt), keep(dcache3, dcache),
                    keep(tcache3, tcache))

        M = self.steps_per_dispatch

        A_stage = self.admit_batch

        def macro_step(params_d, params_t, tokens, length, prompt_end,
                       slot_max_new, active, acc_sum, blk_cnt, dcache,
                       tcache, st_tokens, st_max_new, st_dcache, st_tcache,
                       n_staged, consumed0, base_key, stop_on_free):
            """M speculative blocks per dispatch with ON-DEVICE SLOT REFILL.

            The host pre-stages up to A prefilled requests (st_* buffers,
            entries consumed0..n_staged-1 live). When a slot finishes
            mid-macro, its final state is snapshotted into per-entry
            HARVEST buffers and the next staged request takes the slot in
            the same iteration — no admission latency, no macro early-exit
            (the r4 regression: at M=4 a freed slot idled up to M-1 blocks
            awaiting host admission and the driver ratio read 0.989; the
            r5 first cut that instead exited the macro on every free paid
            the ~22 ms dispatch floor per completion and measured 0.95).
            Entries are consumed in increasing order; assigned[a] records
            the slot entry `a` refilled so the host can replay the
            deterministic chain (entry order x slot order) and map each
            harvest snapshot to the request the slot held at that moment.

            stop_on_free (traced bool): when the host queue has MORE
            requests than were staged, exit once a slot frees with the
            staging stock exhausted — otherwise run the full M."""
            def cond(st):
                (i, _tok, _len, active, done_now, _mn, _acc, _blk, _dc,
                 _tc, consumed, _asg, _ht, _hl, _ha, _hb) = st
                starve = stop_on_free & jnp.any(done_now) & \
                    (consumed >= n_staged)
                return (i < M) & jnp.any(active) & ~starve

            def body(st):
                (i, tokens, length, active, done_now, slot_mn, acc_sum,
                 blk_cnt, dcache, tcache, consumed, assigned,
                 h_tokens, h_length, h_acc, h_blk) = st
                ki = jax.random.fold_in(base_key, i)
                keys = jax.vmap(lambda s: jax.random.fold_in(ki, s))(
                    jnp.arange(n_slots))
                (tokens, length, done2, acc_sum, blk_cnt, dcache,
                 tcache) = pool_step(params_d, params_t, tokens, length,
                                     prompt_end, slot_mn, active,
                                     acc_sum, blk_cnt, dcache, tcache,
                                     keys)
                # ---- on-device refill of freed slots ----
                freed = active & done2
                rank = jnp.cumsum(freed.astype(jnp.int32)) - 1
                entry = consumed + rank                       # [SLOTS]
                can = freed & (entry < n_staged)
                idx_h = jnp.where(can, entry, A_stage)   # OOB pad: dropped
                # snapshot the finishing request into its harvest entry
                h_tokens = h_tokens.at[idx_h].set(tokens)
                h_length = h_length.at[idx_h].set(length)
                h_acc = h_acc.at[idx_h].set(acc_sum)
                h_blk = h_blk.at[idx_h].set(blk_cnt)
                assigned = assigned.at[idx_h].set(
                    jnp.arange(n_slots, dtype=jnp.int32))
                # gather the staged request into the slot
                e = jnp.clip(entry, 0, A_stage - 1)

                def merge(slot_leaf, staged_leaf):
                    g = jnp.take(staged_leaf, e, axis=0)
                    c = jnp.reshape(can,
                                    (n_slots,) + (1,) * (g.ndim - 1))
                    return jnp.where(c, g, slot_leaf)

                tokens = merge(tokens, st_tokens)
                length = jnp.where(can, jnp.int32(self.bucket), length)
                slot_mn = jnp.where(can, jnp.take(st_max_new, e), slot_mn)
                acc_sum = jnp.where(can, 0, acc_sum)
                blk_cnt = jnp.where(can, 0, blk_cnt)
                dcache = jax.tree.map(merge, dcache, st_dcache)
                tcache = jax.tree.map(merge, tcache, st_tcache)
                consumed = consumed + jnp.sum(can.astype(jnp.int32))
                return (i + 1, tokens, length, (active & ~done2) | can,
                        (done_now | done2) & ~can, slot_mn, acc_sum,
                        blk_cnt, dcache, tcache, consumed, assigned,
                        h_tokens, h_length, h_acc, h_blk)

            st = (jnp.int32(0), tokens, length, active,
                  jnp.zeros_like(active), slot_max_new, acc_sum, blk_cnt,
                  dcache, tcache, consumed0,
                  jnp.full((A_stage,), -1, jnp.int32),
                  jnp.zeros((A_stage, S), jnp.int32),
                  jnp.zeros((A_stage,), jnp.int32),
                  jnp.zeros((A_stage,), jnp.int32),
                  jnp.zeros((A_stage,), jnp.int32))
            (_, tokens, length, active, done_now, slot_mn, acc_sum,
             blk_cnt, dcache, tcache, consumed, assigned, h_tokens,
             h_length, h_acc, h_blk) = jax.lax.while_loop(cond, body, st)
            return (tokens, length, active, done_now, slot_mn, acc_sum,
                    blk_cnt, dcache, tcache, consumed, assigned, h_tokens,
                    h_length, h_acc, h_blk)

        # donate the big per-slot buffers: the step updates state in place
        # instead of allocating a second copy of every cache each step
        self._step = jax.jit(macro_step if M > 1 else pool_step,
                             donate_argnums=(2, 3, 7, 8, 9, 10))

        def prefill_batch(params_d, params_t, prompts, prompt_lens):
            """Prefill a BATCH of admissions in one program: prompts
            [A, bucket], prompt_lens [A] -> (tokens [A, S], dcache/tcache
            with leading A axis). One dispatch per admission round instead
            of 2*A serialized programs — the measured prefill overhead was
            the common cost diluting the continuous-vs-lockstep ratio
            toward 1 (r4 serving profile: ~1.2s of a ~3s 12-request run)."""
            A_ = prompts.shape[0]
            start = (self.bucket - prompt_lens)[:, None].astype(jnp.int32)
            start = jnp.broadcast_to(start, (A_, R))
            dcache = jax.vmap(
                lambda st: init_cache(cfg_d, R, S)._replace(start=st))(start)
            tcache = jax.vmap(lambda st: t_init(R, S, st))(start)
            pk = jnp.broadcast_to(prompts[:, None, :],
                                  (A_, R, self.bucket))
            _, dcache = jax.vmap(
                lambda p, c: transformer.forward(cfg_d, params_d,
                                                 p[:, :-2], c))(pk, dcache)
            # target prefill through the same slot-batched forward (the A
            # axis rides as the slot axis) so sharded targets prefill
            # sharded too
            _, tcache = tfwd(params_t, pk[:, :, :-1], tcache)
            tokens = jnp.zeros((A_, S), jnp.int32).at[:, :self.bucket].set(
                prompts)
            return tokens, dcache, tcache

        self._prefill_batch = jax.jit(prefill_batch)

        A = self.admit_batch

        def scatter(state: SlotState, slots, max_new_a, tokens_new, dc_new,
                    tc_new):
            """Admit up to A staged requests in ONE donated program.

            slots [A] int32 target slot ids; rows >= n_slots are padding and
            rely on JAX's scatter semantics (out-of-bounds updates are
            DROPPED) — do NOT clip them into range: the former
            clip-plus-where form aliased padding rows onto slot n_slots-1,
            and when a REAL admission targeted that last slot the
            duplicate-index scatter could apply the stale padding value
            last, silently undoing the admission and DEADLOCKING the slot
            (occupied in slot_rid, never active, never done — run_all then
            spun to its step cap; found via the serving bench's 1.1 tok/s).
            tokens_new [A, S]; dc_new/tc_new carry a leading A axis. The
            donated state buffers are updated in place — no per-slot
            full-cache copy."""
            A_ = slots.shape[0]

            def put(buf, new):
                return jax.tree.map(lambda b, n: b.at[slots].set(n),
                                    buf, new)

            bucket_i = jnp.full((A_,), self.bucket, jnp.int32)
            return state._replace(
                tokens=state.tokens.at[slots].set(tokens_new),
                length=state.length.at[slots].set(bucket_i),
                prompt_end=state.prompt_end.at[slots].set(bucket_i),
                max_new=state.max_new.at[slots].set(max_new_a),
                active=state.active.at[slots].set(jnp.ones((A_,), bool)),
                done=state.done.at[slots].set(jnp.zeros((A_,), bool)),
                acc_sum=state.acc_sum.at[slots].set(
                    jnp.zeros((A_,), jnp.int32)),
                blk_cnt=state.blk_cnt.at[slots].set(
                    jnp.zeros((A_,), jnp.int32)),
                dcache=put(state.dcache, dc_new),
                tcache=put(state.tcache, tc_new))

        self._scatter = jax.jit(scatter, donate_argnums=(0,))

        def clear_slots(state: SlotState, mask):
            """Deactivate + zero-telemetry all harvested slots in ONE
            donated program (per-slot .at updates were one dispatch each —
            ~22 ms apiece on the relay backend, paid per finished
            request)."""
            keep = ~mask
            return state._replace(
                active=state.active & keep,
                done=state.done & keep,
                acc_sum=jnp.where(mask, 0, state.acc_sum),
                blk_cnt=jnp.where(mask, 0, state.blk_cnt))

        self._clear_slots = jax.jit(clear_slots, donate_argnums=(0,))

    # ---- state management ---------------------------------------------
    def _init_state(self) -> SlotState:
        R, S = self.R, self.S
        dc = init_cache(self.cfg_d, R, S)
        tc = self._t_init(R, S, jnp.zeros((R,), jnp.int32))
        stack = lambda c: jax.tree.map(
            lambda x: jnp.stack([x] * self.n_slots), c)
        # NOTE: donated pytrees must not alias buffers (f(donate(a),
        # donate(a)) is an error), so every field gets its own zeros
        return SlotState(
            tokens=jnp.zeros((self.n_slots, S), jnp.int32),
            length=jnp.full((self.n_slots,), 2, jnp.int32),
            prompt_end=jnp.full((self.n_slots,), self.bucket, jnp.int32),
            max_new=jnp.full((self.n_slots,),
                             self.engine.max_new_tokens, jnp.int32),
            active=jnp.zeros((self.n_slots,), bool),
            done=jnp.zeros((self.n_slots,), bool),
            acc_sum=jnp.zeros((self.n_slots,), jnp.int32),
            blk_cnt=jnp.zeros((self.n_slots,), jnp.int32),
            dcache=stack(dc), tcache=stack(tc))

    def submit(self, rid: int, prompt_ids: List[int], max_new: int = 0):
        ids = list(prompt_ids)[-self.bucket:]
        padded = np.asarray([0] * (self.bucket - len(ids)) + ids, np.int32)
        self.queue.append(Request(rid, padded, len(ids),
                                  max_new or self.engine.max_new_tokens))

    def _admit(self):
        """Prefill queued requests into staging and scatter them into free
        slots — at most admit_batch per scatter, NO device-synced occupancy
        reads (slot_rid is the source of truth)."""
        free = [s for s in range((self.n_slots)) if self.slot_rid[s] == -1]
        while self.queue and free:
            batch = []
            while self.queue and free and len(batch) < self.admit_batch:
                req = self.queue.popleft()
                s = free.pop(0)
                batch.append((s, req))
                self.slot_rid[s] = req.rid
                self.running[req.rid] = req
            A = self.admit_batch
            # ONE batched prefill program for the whole admission round
            # (pad rows repeat the last prompt; their scatter targets are
            # out-of-bounds and dropped)
            prompts = np.stack([b[1].prompt for b in batch]
                               + [batch[-1][1].prompt] * (A - len(batch)))
            plens = np.asarray([b[1].prompt_len for b in batch]
                               + [batch[-1][1].prompt_len] * (A - len(batch)),
                               np.int32)
            tokens_new, dc_new, tc_new = self._prefill_batch(
                self.params_d, self.params_t, jnp.asarray(prompts),
                jnp.asarray(plens))
            slots = np.full((A,), self.n_slots, np.int32)  # pad -> dropped
            slots[:len(batch)] = [b[0] for b in batch]
            mn = np.full((A,), self.engine.max_new_tokens, np.int32)
            mn[:len(batch)] = [min(b[1].max_new, self.engine.max_new_tokens)
                               for b in batch]
            self.state = self._scatter(self.state, jnp.asarray(slots),
                                       jnp.asarray(mn), tokens_new, dc_new,
                                       tc_new)

    def _empty_staged(self):
        R, S, A = self.R, self.S, self.admit_batch
        start = jnp.zeros((A, R), jnp.int32)
        dc = jax.vmap(
            lambda st: init_cache(self.cfg_d, R, S)._replace(start=st))(start)
        tc = jax.vmap(lambda st: self._t_init(R, S, st))(start)
        return (jnp.zeros((A, S), jnp.int32), jnp.zeros((A,), jnp.int32),
                dc, tc)

    def _stage(self):
        """Prefill up to admit_batch queued requests into the persistent
        on-device staging buffers — the macro's refill stock. Entries are
        consumed strictly in order, so the stock is only re-filled once
        fully consumed (a partial top-up would need device compaction)."""
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
        tokens_new, dc_new, tc_new = self._prefill_batch(
            self.params_d, self.params_t, jnp.asarray(prompts),
            jnp.asarray(plens))
        mn = np.full((A,), self.engine.max_new_tokens, np.int32)
        mn[:len(batch)] = [min(b.max_new, self.engine.max_new_tokens)
                           for b in batch]
        self._staged = (tokens_new, jnp.asarray(mn), dc_new, tc_new)
        self._staged_rids = [b.rid for b in batch]
        self._staged_n = len(batch)
        self._staged_consumed = 0

    def _admit_staged_to_free(self):
        """Fallback path: staged stock left over with FREE slots at a step
        boundary (e.g. the queue drained into staging while slots
        finished) — scatter the remaining prefilled entries straight into
        free slots with the normal admission program, so staged requests
        can never deadlock waiting for a refill that no active slot will
        trigger."""
        if self._staged_consumed >= self._staged_n:
            return
        free = [s for s in range(self.n_slots) if self.slot_rid[s] == -1]
        if not free:
            return
        A = self.admit_batch
        tokens_new, mn_st, dc_new, tc_new = self._staged
        slots = np.full((A,), self.n_slots, np.int32)   # pad -> dropped
        for a in range(self._staged_consumed, self._staged_n):
            if not free:
                break
            s = free.pop(0)
            slots[a] = s
            self.slot_rid[s] = self._staged_rids[a]
            self._staged_consumed = a + 1
        self.state = self._scatter(self.state, jnp.asarray(slots), mn_st,
                                   tokens_new, dc_new, tc_new)

    def _reconcile(self, consumed, assigned, h_tokens, h_length, h_acc,
                   h_blk) -> List[Request]:
        """Replay the macro's deterministic refill chain: entry a displaced
        the request slot assigned[a] held at that moment; its final state
        is in harvest row a."""
        finished: List[Request] = []
        c1 = int(consumed)
        c0 = self._staged_consumed
        if c1 <= c0:
            return finished
        assigned, h_tokens, h_length, h_acc, h_blk = jax.device_get(
            (assigned, h_tokens, h_length, h_acc, h_blk))
        eos = self.cfg_t.eos_token_id
        for a in range(c0, c1):
            s = int(assigned[a])
            req = self.running.pop(self.slot_rid[s])
            ln = int(h_length[a])
            toks = h_tokens[a][self.bucket:ln]
            tl = toks.tolist()
            if eos in tl:
                toks = toks[:tl.index(eos) + 1]
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
        done = np.asarray(self.state.done)
        if not done.any():
            return finished
        # one consolidated fetch for the whole harvest round (the per-slot
        # tokens fetches were one RTT each)
        acc, blk, lengths, all_toks = jax.device_get(
            (self.state.acc_sum, self.state.blk_cnt, self.state.length,
             self.state.tokens))
        mask = np.zeros((self.n_slots,), bool)
        for s in range(self.n_slots):
            if done[s] and self.slot_rid[s] >= 0:
                rid = self.slot_rid[s]
                req = self.running.pop(rid)
                ln = int(lengths[s])
                toks = all_toks[s][self.bucket:ln]
                eos = self.cfg_t.eos_token_id
                if eos in toks.tolist():
                    toks = toks[:toks.tolist().index(eos) + 1]
                req.out_tokens = toks[:req.max_new]
                req.accepts = int(acc[s])
                req.blocks = int(blk[s])
                self._done_acc += req.accepts
                self._done_blk += req.blocks
                finished.append(req)
                mask[s] = True
                self.slot_rid[s] = -1
        if mask.any():
            # one donated program deactivates + zeroes telemetry for the
            # whole harvest round (zeroing keeps stats() from
            # double-counting a harvested request parked in its old slot)
            self.state = self._clear_slots(self.state, jnp.asarray(mask))
        return finished

    def step(self) -> List[Request]:
        """Admit queued requests, run one speculative block for all active
        slots (M per dispatch with on-device refill when macro-stepping),
        harvest finished requests."""
        t0 = time.perf_counter()
        # staged entries were submitted before the current queue head:
        # drain leftover stock into free slots first (FIFO)
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
            st_tokens, st_mn, st_dc, st_tc = self._staged
            (tokens, length, active, done_now, slot_mn, acc_sum, blk_cnt,
             dcache, tcache, consumed, assigned, h_tokens, h_length, h_acc,
             h_blk) = self._step(
                self.params_d, self.params_t, st.tokens, st.length,
                st.prompt_end, st.max_new, st.active, st.acc_sum,
                st.blk_cnt, st.dcache, st.tcache, st_tokens, st_mn, st_dc,
                st_tc, jnp.int32(self._staged_n),
                jnp.int32(self._staged_consumed), k,
                jnp.bool_(len(self.queue) > 0))
            self.state = st._replace(
                tokens=tokens, length=length, max_new=slot_mn,
                active=active, done=st.done | done_now, acc_sum=acc_sum,
                blk_cnt=blk_cnt, dcache=dcache, tcache=tcache)
            out = self._reconcile(consumed, assigned, h_tokens, h_length,
                                  h_acc, h_blk)
        else:
            keys = jax.random.split(k, self.n_slots)
            (tokens, length, done, acc_sum, blk_cnt, dcache,
             tcache) = self._step(
                self.params_d, self.params_t, st.tokens, st.length,
                st.prompt_end, st.max_new, st.active, st.acc_sum,
                st.blk_cnt, st.dcache, st.tcache, keys)
            self.state = st._replace(tokens=tokens, length=length,
                                     done=st.done | done, acc_sum=acc_sum,
                                     blk_cnt=blk_cnt, dcache=dcache,
                                     tcache=tcache)
            out = []
        out.extend(self._harvest())
        # step_time spans admit+dispatch+harvest: the _step dispatch alone
        # is ASYNC on the relay backend (returns in ~0; the device sync is
        # the harvest's done-flag fetch), so timing only the dispatch made
        # stats() tokens_per_s meaningless
        self.step_time += time.perf_counter() - t0
        self.total_committed += sum(len(r.out_tokens) for r in out)
        return out

    def stats(self) -> Dict[str, float]:
        """Aggregate serving telemetry: block efficiency over every
        HARVESTED request plus the in-flight slots, and committed-token
        throughput over the engine-step wall time."""
        acc = float(np.asarray(self.state.acc_sum, np.float64).sum()) \
            + self._done_acc
        blk = float(np.asarray(self.state.blk_cnt, np.float64).sum()) \
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
