"""Single-process oracle: reference semantics at test scale.

Plays the role the reference's in-memory loops play
(/root/reference/src/image_dedup/dedup.py:128-240) — eager, O(n^2),
plain numpy — at a scale where that is fine.  It defines "the
reference's cluster assignments at identical shingle/signature config"
(north_rule) for the recall gate:

  * exact groups by sha256                      (dedup.py:182-188)
  * all-pairs exact Jaccard over distinct contents, threshold filter
                                                (dedup.py:204-240's
                                                 distance check, exact)
  * GREEDY seed-absorption groups — the reference's exact grouping
    rule: first unmatched file seeds a group and absorbs every later
    file within threshold OF THE SEED (dedup.py:204-240)
  * transitive-closure components — what the Spark pipeline computes
    (a coarsening of greedy; see SURVEY §5.2 note)

Everything is keyed by the human-readable `key` (repo/path@commit);
tests join Spark output back by key and compare set-of-frozensets.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from codedup import kernels as K
from codedup.config import DedupConfig


@dataclass
class OracleResult:
    sha256: dict[str, str]                      # key -> hex sha256 of content
    pairs: pd.DataFrame                         # a,b (keys, a<b), jaccard, hamming, lcs_frac
    greedy_groups: list[frozenset[str]]         # reference greedy semantics
    components: list[frozenset[str]]            # transitive closure (exact ∪ near)
    exact_groups: list[frozenset[str]] = field(default_factory=list)

    def co_membership_pairs(self) -> set[tuple[str, str]]:
        out: set[tuple[str, str]] = set()
        for comp in self.components:
            ms = sorted(comp)
            for i in range(len(ms)):
                for j in range(i + 1, len(ms)):
                    out.add((ms[i], ms[j]))
        return out


def run_oracle(files: pd.DataFrame, cfg: DedupConfig | None = None) -> OracleResult:
    cfg = cfg or DedupConfig()
    files = files.sort_values(["repo", "path", "commit"], ignore_index=True)
    keys = (files.repo + "/" + files.path + "@" + files.commit).tolist()
    contents = files.content.tolist()

    sha = {k: hashlib.sha256(c.encode()).hexdigest() for k, c in zip(keys, contents)}

    # exact groups by sha256 (dedup.py:182-188)
    by_sha: dict[str, list[str]] = {}
    for k in keys:
        by_sha.setdefault(sha[k], []).append(k)
    exact_groups = [frozenset(v) for v in by_sha.values() if len(v) > 1]

    # distinct-content representatives, first-seen order (dedup.py:195-201)
    rep_of_sha: dict[str, str] = {}
    rep_keys: list[str] = []
    rep_content: dict[str, str] = {}
    for k, c in zip(keys, contents):
        s = sha[k]
        if s not in rep_of_sha:
            rep_of_sha[s] = k
            rep_keys.append(k)
            rep_content[k] = c

    norm_content = {
        k: (K.normalize_text(rep_content[k]) if cfg.normalize_ws else rep_content[k])
        for k in rep_keys
    }
    shingles = {
        k: K.shingle_hashes(norm_content[k], cfg.shingle_k, normalize_ws=False,
                            mode=cfg.shingle_mode)
        for k in rep_keys
    }
    simhash = {k: K.simhash64(shingles[k]) for k in rep_keys}

    # all-pairs exact verification (the O(n^2) loop, made exact)
    rows = []
    adj: dict[str, set[str]] = {k: set() for k in rep_keys}
    for i in range(len(rep_keys)):
        for j in range(i + 1, len(rep_keys)):
            ka, kb = rep_keys[i], rep_keys[j]
            jac = K.exact_jaccard(shingles[ka], shingles[kb])
            if jac < cfg.jaccard_threshold:
                continue
            ta, tb = norm_content[ka], norm_content[kb]
            lf = 1.0 if ta == tb else K.lcs_fraction(ta, tb, cfg.lcs_max_chars)
            if lf < cfg.lcs_min_frac:
                continue
            a, b = sorted((ka, kb))
            rows.append((a, b, jac, K.hamming64(simhash[ka], simhash[kb]), lf))
            adj[ka].add(kb)
            adj[kb].add(ka)
    pairs = pd.DataFrame(rows, columns=["a", "b", "jaccard", "hamming", "lcs_frac"])

    # greedy seed-absorption (dedup.py:204-240): first unmatched seeds,
    # absorbs all LATER files within threshold of the seed
    matched: set[str] = set()
    greedy: list[frozenset[str]] = []
    for i, ka in enumerate(rep_keys):
        if ka in matched:
            continue
        group = [ka]
        for kb in rep_keys[i + 1:]:
            if kb in matched:
                continue
            if kb in adj[ka]:
                group.append(kb)
                matched.add(kb)
        if len(group) > 1:
            matched.add(ka)
            greedy.append(frozenset(group))

    # transitive closure over near edges ∪ exact groups
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x: str, y: str) -> None:
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)

    for ka, nbrs in adj.items():
        for kb in nbrs:
            union(ka, kb)
    for g in exact_groups:
        ms = sorted(g)
        for m in ms[1:]:
            union(ms[0], m)
    # exact members follow their representative into near components
    for s, members in by_sha.items():
        rep = rep_of_sha[s]
        for m in members:
            if m != rep:
                union(rep, m)

    comp: dict[str, set[str]] = {}
    for k in parent:
        comp.setdefault(find(k), set()).add(find(k))
        comp[find(k)].add(k)
    components = [frozenset(v) for v in comp.values() if len(v) > 1]

    return OracleResult(
        sha256=sha,
        pairs=pairs,
        greedy_groups=greedy,
        components=components,
        exact_groups=exact_groups,
    )
