#!/usr/bin/env python3
"""Independent pure-Python replica of the FADS streaming k-anonymization
replay (Guo & Zhang 2013, as realized by the reference Generalizer —
/root/reference/src/main/java/fads/Generalizer.java:97-189, Cluster.java:18-85)
for oracle-checking graft's Spark replay output.

Semantics mirror graft.fads.Fads.Engine exactly (same IEEE double ops in the
same order, so branch decisions are bit-identical):
  - tuple buffer ordered by (arrival_ms, seq); count trigger buffer > B
  - running per-QID global bounds (never expire)
  - reusable clusters FIFO with TTL expiry from the head
  - kNN by average per-QID-normalized L1 distance, tie-break (arrival, seq)
  - optional unique-PID constraint (paper) / reference distance quirk
  - reuse-vs-new-cluster decision by information loss
  - end-of-stream drain, oldest first, at the last seen clock

Used by tools/check_fads_oracle.py to cross-check both the Spark output and
the DuckDB recursive-CTE oracle at small SF.
"""
import bisect


class Engine:
    def __init__(self, k, buffer_constraint, reuse_ttl_ms, nqid,
                 ref_distance=False, raw_distance=False, unique_pid=True,
                 fixed_lo=None, fixed_hi=None):
        self.k = k
        self.B = buffer_constraint
        self.ttl = reuse_ttl_ms
        self.nqid = nqid
        self.ref_distance = ref_distance
        # Q3 raw-field-index bug: kNN distance reads the tuple's leading
        # raw fields (Generalizer.java:355); everything else stays QID
        self.raw_distance = raw_distance
        self.unique_pid = unique_pid
        self.fixed_lo = fixed_lo
        self.fixed_hi = fixed_hi
        # state
        self.buffer = []  # list of (arrival, seq, qids, pid) kept sorted
        self.glo = [float("inf")] * nqid
        self.ghi = [float("-inf")] * nqid
        self.clusters = []  # list of (created, cseq, lo, hi), append order
        self.cseq = 0

    def _norm_lo(self):
        return self.fixed_lo if self.fixed_lo is not None else self.glo

    def _norm_hi(self):
        return self.fixed_hi if self.fixed_hi is not None else self.ghi

    def step(self, qids, pid, seq, now, raw=None):
        """Process one arrival; yields (seq, lo, hi, suppressed) releases."""
        bisect.insort(self.buffer,
                      (now, seq, qids, pid, raw if raw is not None else qids))
        for i in range(self.nqid):
            if qids[i] < self.glo[i]:
                self.glo[i] = qids[i]
            if qids[i] > self.ghi[i]:
                self.ghi[i] = qids[i]
        while self.clusters and self.clusters[0][0] + self.ttl < now:
            self.clusters.pop(0)
        if len(self.buffer) > self.B:
            oldest = self.buffer.pop(0)
            return self._generalize(oldest, now)
        return []

    def drain(self, now):
        out = []
        while self.buffer:
            oldest = self.buffer.pop(0)
            out.extend(self._generalize(oldest, now))
        return out

    def _distance(self, a, b):
        lo, hi = self._norm_lo(), self._norm_hi()
        s = 0.0
        for i in range(self.nqid):
            d = abs(a[i] - b[i])
            if self.ref_distance:
                # reference precedence bug: abs(d)/gmax - gmin
                if hi[i] != 0:
                    s += d / hi[i] - lo[i]
                else:
                    s -= lo[i]
            else:
                rng = hi[i] - lo[i]
                if rng > 0:
                    s += d / rng
        return s / self.nqid

    def _info_loss(self, clo, chi):
        lo, hi = self._norm_lo(), self._norm_hi()
        s = 0.0
        for i in range(self.nqid):
            rng = hi[i] - lo[i]
            if rng > 0:
                s += (chi[i] - clo[i]) / rng
        return s / self.nqid

    def _best_fitting(self, qids):
        best = None
        best_loss = float("inf")
        for c in self.clusters:  # append order; ties keep the earliest
            created, cs, clo, chi = c
            if all(qids[i] > clo[i] and qids[i] < chi[i]
                   for i in range(self.nqid)):
                loss = self._info_loss(clo, chi)
                if best is None or loss < best_loss:
                    best = c
                    best_loss = loss
        return best

    def _knn(self, pivot):
        _, pseq, pq, ppid, praw = pivot
        if self.raw_distance:
            key = lambda t: (self._distance(praw, t[4]), t[0], t[1])
        else:
            key = lambda t: (self._distance(pq, t[2]), t[0], t[1])
        ranked = sorted(self.buffer, key=key)
        picked = []
        if self.unique_pid:
            seen = {ppid}
            for t in ranked:
                if len(picked) >= self.k - 1:
                    break
                if t[3] not in seen:
                    seen.add(t[3])
                    picked.append(t)
        else:
            picked = ranked[:self.k - 1]
        return picked if len(picked) >= self.k - 1 else None

    def _reuse_or_suppress(self, pivot):
        seq, qids = pivot[1], pivot[2]
        best = self._best_fitting(qids)
        if best is not None:
            return [(seq, list(best[2]), list(best[3]), False)]
        return [(seq, list(self._norm_lo()), list(self._norm_hi()), True)]

    def _generalize(self, pivot, now):
        arrival, seq, qids, pid = pivot[0], pivot[1], pivot[2], pivot[3]
        if len(self.buffer) < self.k - 1:
            return self._reuse_or_suppress(pivot)
        neighbors = self._knn(pivot)
        if neighbors is None:
            return self._reuse_or_suppress(pivot)
        members = [pivot] + neighbors
        flo = [min(m[2][i] for m in members) for i in range(self.nqid)]
        fhi = [max(m[2][i] for m in members) for i in range(self.nqid)]
        best = self._best_fitting(qids)
        if best is not None and \
                self._info_loss(best[2], best[3]) < self._info_loss(flo, fhi):
            return [(seq, list(best[2]), list(best[3]), False)]
        self.cseq += 1
        for n in neighbors:
            self.buffer.remove(n)
        self.clusters.append((now, self.cseq, flo, fhi))
        return [(m[1], list(flo), list(fhi), False) for m in members]


def replay(rows, **cfg):
    """rows: iterable of (qids, pid, seq, clock_ms[, raw]) in processing
    order. Returns list of (seq, lo, hi, suppressed)."""
    eng = Engine(**cfg)
    out = []
    last = 0
    for row in rows:
        qids, pid, seq, now = row[:4]
        raw = row[4] if len(row) > 4 else None
        last = now
        out.extend(eng.step(qids, pid, seq, now, raw=raw))
    out.extend(eng.drain(last))
    return out


def replay_sharded(rows_with_shard, global_norm=False, **cfg):
    """rows_with_shard: (shard, qids, pid, seq, clock_ms) in processing
    order. Independent engine per shard; optional fixed domain-bound
    normalization over the WHOLE input (graft's globalNorm)."""
    if global_norm:
        nq = cfg["nqid"]
        cfg = dict(cfg)
        cfg["fixed_lo"] = [min(r[1][i] for r in rows_with_shard)
                           for i in range(nq)]
        cfg["fixed_hi"] = [max(r[1][i] for r in rows_with_shard)
                           for i in range(nq)]
    shards = {}
    order = {}
    for shard, qids, pid, seq, now in rows_with_shard:
        shards.setdefault(shard, []).append((qids, pid, seq, now))
        order.setdefault(shard, len(order))
    out = []
    for shard in sorted(shards, key=order.get):
        out.extend(replay(shards[shard], **cfg))
    return out
