"""Vectorized (numpy) hot loops for the keyed-state NFA steppers.

The per-event Python dict/deque transition of the fork/loop stepper
family (cep.py) is the engine's measured streaming bound (0.2-0.66 M
events/s per key — BASELINE.md r12/r13 stress tiers). This module
replaces the per-event loop with closed-form chain advancement:

Every run in the fork-family machines is INDEPENDENT — anchors never
interact — and a run's trajectory is DETERMINISTIC: a run awaiting
stage j advances at the first event after its current position whose
condition mask carries stage j's bit (subject to within-expiry against
the run's own anchor time, strict immediate-next kills, and veto
kills). So instead of stepping every event, each run's next position
is one `np.searchsorted` into the precomputed per-bit position index,
and a whole batch advances in O(K) vectorized rounds over the run
arrays instead of O(events) Python iterations. Loop-stage counting
(one_or_more) has the same structure: a parked run contributes one
match per close event inside its horizon, which is a prefix-count
difference, not a loop.

Exactness: the scalar steppers remain in cep.py as the dispatching
fallback for shapes outside this module's envelope, and
tests/test_cep_vec_equiv.py drives both implementations over
randomized multi-batch streams (strict/veto/until/consec/carried
state) asserting bit-identical counts, emitted frames and state rows.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# batch extraction
# ---------------------------------------------------------------------------


def sorted_batch(pdf_iter, nk: int, type_codes: dict | None):
    """Concatenate the micro-batch's pandas frames into (t µs, c mask)
    int64 arrays sorted by (t, tiebreak, c) — exactly the scalar
    steppers' `sorted(rows)` order. Columns are positional: keys first
    (nk of them), then time, tiebreak, event type/mask."""
    ts, eids, cs = [], [], []
    for pdf in pdf_iter:
        if len(pdf) == 0:
            continue
        ts.append(pdf.iloc[:, nk].to_numpy("datetime64[ns]")
                  .astype("int64") // 1000)
        eids.append(pdf.iloc[:, nk + 1].to_numpy())
        col = pdf.iloc[:, nk + 2]
        if type_codes is None:
            cs.append(col.to_numpy())
        else:
            cs.append(col.map(lambda x: type_codes.get(x, 0))
                      .fillna(0).to_numpy("int64"))
    if not ts:
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    t = np.concatenate(ts)
    eid = np.concatenate(eids)
    c = np.concatenate(cs).astype(np.int64, copy=False)
    try:
        order = np.lexsort((c, eid, t))
    except TypeError:
        # non-numeric tiebreak column: fall back to Python's tuple sort
        order = np.asarray(
            sorted(range(t.size), key=lambda i: (t[i], eid[i], c[i])),
            dtype=np.int64)
    return t[order], c[order]


# ---------------------------------------------------------------------------
# the chain core
# ---------------------------------------------------------------------------


def _positions(c, bits, K):
    """pos[j] = sorted positions whose mask carries await-bit j."""
    return {j: np.flatnonzero((c & bits[j]) != 0) for j in range(1, K)}


def advance(t, c, bits, strict, veto, within_us, A, J, P, K,
            posj=None, block_last=None):
    """Advance every run (anchor time A, awaiting stage J in 1..K-1,
    last position P; P = -1 for runs carried across the batch
    boundary) until it arrives past await K-1, dies, or stalls at
    batch end.

    Kills (identical to the scalar steppers): within-expiry against
    the run's own anchor (an advance event past anchor+within finds
    the run already popped), strict[j] immediate-next-or-die, veto[j]
    events before the next advance (advance wins ties — the scalar
    machines test the await first). `block_last` (bool per position)
    marks events where arrival is suppressed AND the run dies — the
    loop machines' `iu and i == K-2` rule.

    Returns (arr_a, arr_p, alive) — arrival anchors/positions in
    arrival order per stage round, and the surviving-run mask; A/J/P
    are updated in place for survivors."""
    n = t.size
    if posj is None:
        posj = _positions(c, bits, K)
    vposj = {j: (np.flatnonzero((c & veto[j]) != 0)
                 if veto is not None and veto[j] else None)
             for j in range(1, K)}
    alive = np.ones(A.size, dtype=bool)
    arr_a, arr_p = [], []
    progressed = True
    while progressed:
        progressed = False
        for j in range(K - 1, 0, -1):
            idx = np.flatnonzero(alive & (J == j))
            if idx.size == 0:
                continue
            a = A[idx]
            p = P[idx]
            if strict[j]:
                q = p + 1
                ok = q < n
                qs = np.minimum(q, n - 1)
                adv = ok & ((c[qs] & bits[j]) != 0)
                if within_us is not None:
                    adv &= (t[qs] - a) <= within_us
                dead = ok & ~adv
            else:
                pj = posj[j]
                if pj.size:
                    k = np.searchsorted(pj, p, side="right")
                    ok = k < pj.size
                    q = np.where(ok, pj[np.minimum(k, pj.size - 1)], n)
                else:
                    ok = np.zeros(p.size, dtype=bool)
                    q = np.full(p.size, n, dtype=np.int64)
                qs = np.minimum(q, n - 1)
                adv = ok.copy()
                if within_us is not None:
                    adv &= (t[qs] - a) <= within_us
                dead = ok & ~adv
                vp = vposj.get(j)
                if vp is not None and vp.size:
                    vk = np.searchsorted(vp, p, side="right")
                    vok = vk < vp.size
                    vq = np.where(vok, vp[np.minimum(vk, vp.size - 1)],
                                  n)
                    kill = vok & (vq < q)
                    dead |= kill
                    adv &= ~kill
            if j == K - 1:
                if block_last is not None and adv.any():
                    blk = adv & block_last[qs]
                    adv &= ~blk
                    dead |= blk
                if adv.any():
                    arr_a.append(a[adv])
                    arr_p.append(q[adv])
                    alive[idx[adv]] = False
                    progressed = True
            else:
                if adv.any():
                    ai = idx[adv]
                    J[ai] = j + 1
                    P[ai] = q[adv]
                    progressed = True
            if dead.any():
                alive[idx[dead]] = False
    if arr_a:
        return (np.concatenate(arr_a), np.concatenate(arr_p), alive)
    return (np.empty(0, np.int64), np.empty(0, np.int64), alive)


def make_runs(t, c, bits, carried_sets, anchor_block=None):
    """Run arrays from carried per-stage anchor sets plus this batch's
    fresh anchors (every event whose mask carries bits[0], minus
    `anchor_block` positions). Carried runs enter at position -1."""
    As, Js, Ps = [], [], []
    for j, s in enumerate(carried_sets, start=1):
        if s:
            arr = np.asarray(sorted(s), dtype=np.int64)
            As.append(arr)
            Js.append(np.full(arr.size, j, dtype=np.int64))
            Ps.append(np.full(arr.size, -1, dtype=np.int64))
    pos0 = np.flatnonzero((c & bits[0]) != 0)
    if anchor_block is not None and pos0.size:
        pos0 = pos0[~anchor_block[pos0]]
    if pos0.size:
        As.append(t[pos0])
        Js.append(np.ones(pos0.size, dtype=np.int64))
        Ps.append(pos0)
    if not As:
        z = np.empty(0, np.int64)
        return z, z.copy(), z.copy()
    return (np.concatenate(As), np.concatenate(Js), np.concatenate(Ps))


def survivor_sets(A, J, P, alive, t_last, within_us, K):
    """Per-stage sorted anchor lists still awaiting at batch end —
    the scalar machines' final expiry pop applied (the last processed
    event pops everything past anchor+within)."""
    m = alive.copy()
    if within_us is not None:
        m &= (t_last - A) <= within_us
    return [np.sort(A[m & (J == j)]).tolist() for j in range(1, K)]


# ---------------------------------------------------------------------------
# loop-stage counting (one_or_more close events)
# ---------------------------------------------------------------------------


def loop_counts(t, c, close_bit, until_bit, within_us, consec,
                arr_a, arr_p, t_last, from_parked=False):
    """Per run at the loop stage: number of matches its loop stage
    emits in this batch, plus end-of-batch survival flags.

    A run that entered the awaiting-loop set at position p (anchor a;
    p = -1 for state carried across the batch boundary) contributes
    one match per close event strictly after p, before the next until
    event, at or under anchor+within. With consecutive(), only the
    unbroken run of close events starting at its first close counts
    (any other event clears the parked set) — and a run that was
    ALREADY PARKED before this batch (`from_parked`) survives only if
    that unbroken run starts at the very first event after p (the
    scalar machine clears the parked set at the first non-close).

    Returns (counts int64, parked bool, waiting bool): parked = run
    sits in the parked set at batch end; waiting = run saw no close
    and still awaits one (meaningless for from_parked runs — a parked
    run never returns to the awaiting set)."""
    n = t.size
    closes = ((c & close_bit) != 0)
    if until_bit:
        iu = (c & until_bit) != 0
        closes &= ~iu
        upos = np.flatnonzero(iu)
    else:
        upos = np.empty(0, np.int64)
    cpos = np.flatnonzero(closes)
    ccum = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(closes, out=ccum[1:])
    a = arr_a
    p = arr_p
    if upos.size:
        uk = np.searchsorted(upos, p, side="right")
        u = np.where(uk < upos.size,
                     upos[np.minimum(uk, upos.size - 1)], n)
    else:
        u = np.full(p.size, n, dtype=np.int64)
    dl = np.searchsorted(t, a + within_us, side="right")
    hi = np.minimum(u, dl)
    lo = np.minimum(p + 1, n)
    fresh = (t_last - a) <= within_us
    if consec:
        # first close after p, inside (p, hi)
        if cpos.size:
            k = np.searchsorted(cpos, p, side="right")
            has = (k < cpos.size)
            q1 = np.where(has, cpos[np.minimum(k, cpos.size - 1)], n)
        else:
            has = np.zeros(p.size, dtype=bool)
            q1 = np.full(p.size, n, dtype=np.int64)
        has &= q1 < hi
        if from_parked:
            # a parked run is cleared at the first non-close event
            has &= q1 == (p + 1)
        # run of consecutive closes starting at q1
        ncpos = np.flatnonzero(~closes)
        if ncpos.size:
            rk = np.searchsorted(ncpos, q1, side="left")
            run_end = np.where(rk < ncpos.size,
                               ncpos[np.minimum(rk, ncpos.size - 1)], n)
        else:
            run_end = np.full(q1.size, n, dtype=np.int64)
        counts = np.where(has, np.minimum(run_end, dl) - q1, 0)
        parked = has & (run_end >= n) & fresh
        waiting = (~has) & (u >= n) & fresh
    else:
        counts = np.maximum(ccum[hi] - ccum[lo], 0)
        if from_parked:
            parked = (u >= n) & fresh
        else:
            parked = (counts > 0) & (u >= n) & fresh
        waiting = (counts == 0) & (u >= n) & fresh
    return counts.astype(np.int64), parked, waiting


def group_loop_orbit(t, c, bits, gl, within_us, ent_a, ent_p, t_last,
                     K):
    """Completions AFTER the first for back-edge group loops, via the
    shared orbit: from a completion position p, the next completion
    position is the SAME for every run (runs differ only in their
    anchor deadline), so the completion graph is one memoized
    successor function and per-run counting is binary lifting over it
    — O((nodes + runs) log n) instead of per-completion work.

    ent_a/ent_p: anchors and FIRST-completion positions (the first
    completion is already counted by the caller). Returns
    (extra_completions_total, [(stage, anchor), ...] survivors) where
    survivors are runs still alive at batch end with the stage they
    stalled at (K-gl .. K-1 awaits)."""
    import bisect
    n = t.size
    posl = {j: np.flatnonzero((c & bits[j]) != 0).tolist()
            for j in range(K - gl, K)}
    nodes: dict[int, int] = {}
    node_adv: list[list[int]] = []   # advance times of the step
    node_nxt: list[int] = []         # successor node idx or -1
    node_order: list[int] = []       # node idx -> position

    def _walk(p0: int) -> None:
        q = int(p0)
        chain = []
        while q not in nodes:
            times = []
            cur = q
            complete = True
            for j in range(K - gl, K):
                lst = posl[j]
                k = bisect.bisect_right(lst, cur)
                if k >= len(lst):
                    complete = False
                    break
                cur = lst[k]
                times.append(int(t[cur]))
            idx = len(node_adv)
            nodes[q] = idx
            node_order.append(q)
            node_adv.append(times)
            chain.append((idx, cur if complete else -1))
            if not complete:
                node_nxt.append(-2)   # patched below
                break
            node_nxt.append(-2)
            q = cur
        for idx, nxt in chain:
            node_nxt[idx] = nodes[nxt] if nxt >= 0 else -1

    for p0 in set(int(x) for x in ent_p):
        _walk(p0)
    m = len(node_adv)
    # binary lifting: up[k][i] = 2^k-th successor; stime[k][i] = time
    # of the LAST completing event along those 2^k steps (times are
    # monotone along the chain, so the last is the max)
    up0 = np.asarray(node_nxt, dtype=np.int64)
    st0 = np.asarray(
        [adv[gl - 1] if len(adv) == gl else np.iinfo(np.int64).max
         for adv in node_adv], dtype=np.int64)
    # a node whose step stalls has no completion: successor -1
    up0 = np.where(st0 == np.iinfo(np.int64).max, -1, up0)
    ups, sts = [up0], [st0]
    while (1 << len(ups)) <= max(m, 1):
        pu, ps = ups[-1], sts[-1]
        nu = np.where(pu >= 0, pu[np.maximum(pu, 0)], -1)
        ns = np.where(pu >= 0, ps[np.maximum(pu, 0)],
                      np.iinfo(np.int64).max)
        nu = np.where(ns == np.iinfo(np.int64).max, -1, nu)
        ups.append(nu)
        sts.append(ns)
    D = ent_a + within_us
    idx = np.asarray([nodes[int(p)] for p in ent_p], dtype=np.int64)
    counts = np.zeros(idx.size, dtype=np.int64)
    for k in range(len(ups) - 1, -1, -1):
        uk, sk = ups[k], sts[k]
        # take the 2^k-step jump iff its LAST completion time fits the
        # run's deadline (sts is MAX when the chain is shorter, so a
        # fitting jump always lands on a real node)
        can = sk[idx] <= D
        counts[can] += (1 << k)
        idx = np.where(can, uk[idx], idx)
    total = int(counts.sum())
    # survivors: runs whose anchor still lives at batch end stall at
    # K-gl + (number of step-advance times <= D) awaits done
    surv = []
    alive = (t_last - ent_a) <= within_us
    for i in np.flatnonzero(alive):
        adv = node_adv[int(idx[i])]
        d = int(D[i])
        done = 0
        for tm in adv:
            if tm <= d:
                done += 1
            else:
                break
        surv.append((K - gl + done, int(ent_a[i])))
    return total, surv

