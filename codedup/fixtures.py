"""Deterministic synthetic corpus generator (FIXTURES.md spec).

Produces the ``files(repo,path,commit,lang,content)`` source table plus
ground-truth side-outputs ``truth_pairs`` / ``truth_clusters`` known by
construction, so recall/precision are measurable without labeling.
Pure function of (tier/size, seed): no time, no os randomness; stable
row order by key.  Generation is plain pandas/pyarrow — Spark never
sees the generator (it is test scaffolding, like the reference's real
scanned corpus behind report1.json).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pandas as pd

from codedup import kernels as K

LANGS = ["python", "java", "cpp", "js", "go", "text"]
EXT = {"python": "py", "java": "java", "cpp": "cc", "js": "js", "go": "go", "text": "txt"}

_SYL = ["al", "be", "cor", "dex", "eta", "fo", "gam", "hex", "ion", "jul",
        "kap", "lam", "mor", "nul", "oct", "pi", "qua", "rho", "sig", "tau",
        "ups", "vex", "wol", "xen", "yam", "zet"]

LICENSE_HEADER = (
    "// Copyright (c) 2019-2024 The Synthetic Project Authors.\n"
    "// \n"
    "// Licensed under the Apache License, Version 2.0 (the \"License\");\n"
    "// you may not use this file except in compliance with the License.\n"
    "// You may obtain a copy of the License at\n"
    "// \n"
    "//     http://www.apache.org/licenses/LICENSE-2.0\n"
    "// \n"
    "// Unless required by applicable law or agreed to in writing, software\n"
    "// distributed under the License is distributed on an \"AS IS\" BASIS,\n"
    "// WITHOUT WARRANTIES OR CONDITIONS OF ANY KIND, either express or\n"
    "// implied. See the License for the specific language governing\n"
    "// permissions and limitations under the License.\n"
    "// \n"
) * 2  # ~1 KB


def _ident(rng: np.random.Generator) -> str:
    n = int(rng.integers(2, 5))
    return "".join(_SYL[int(i)] for i in rng.integers(0, len(_SYL), n))


def _commit(key: str, seed: int) -> str:
    return hashlib.sha1(f"{seed}:{key}".encode()).hexdigest()


@dataclass
class _Emitted:
    repo: str
    path: str
    commit: str
    lang: str
    content: str

    @property
    def key(self) -> str:
        return f"{self.repo}/{self.path}@{self.commit}"


def _template_lines(rng: np.random.Generator, lang: str, nlines: int) -> list[str]:
    """Structural template: each line is a format string over idents v0..v9."""
    pats = {
        "python": ["def {0}_{1}({2}, {3}):", "    {4} = {2} + {3} * {5}",
                   "    if {4} > {6}:", "        return {0}_{7}({4})",
                   "    return {4} - {8}", "", "class {9}:", "    pass", ""],
        "java": ["public int {0}{1}(int {2}, int {3}) {{", "  int {4} = {2} + {3} * {5};",
                 "  if ({4} > {6}) {{ return {0}{7}({4}); }}", "  return {4} - {8};", "}}", ""],
        "cpp": ["int {0}_{1}(int {2}, int {3}) {{", "  int {4} = {2} + {3} * {5};",
                "  if ({4} > {6}) return {0}_{7}({4});", "  return {4} - {8};", "}}", ""],
        "js": ["function {0}{1}({2}, {3}) {{", "  const {4} = {2} + {3} * {5};",
               "  if ({4} > {6}) return {0}{7}({4});", "  return {4} - {8};", "}}", ""],
        "go": ["func {0}{1}({2} int, {3} int) int {{", "\t{4} := {2} + {3}*{5}",
               "\tif {4} > {6} {{", "\t\treturn {0}{7}({4})", "\t}}", "\treturn {4} - {8}", "}}", ""],
        "text": ["The {0} of {1} depends on {2} and {3}.",
                 "When {4} exceeds {6}, consider {0} {7} instead of {8}.",
                 "Notes about {5} and {9}.", ""],
    }[lang]
    out: list[str] = []
    while len(out) < nlines:
        out.extend(pats[int(i)] for i in rng.integers(0, len(pats), min(len(pats), nlines - len(out))))
    return out[:nlines]


def _render(template: list[str], idents: list[str]) -> str:
    return "\n".join(line.format(*idents) for line in template) + "\n"


# --- mutations (relation = near) ----------------------------------------

def _mut_ws(rng, text: str) -> str:
    lines = text.split("\n")
    for i in rng.integers(0, max(len(lines), 1), max(2, len(lines) // 8)):
        lines[int(i)] = lines[int(i)] + " " * int(rng.integers(1, 4))
    return "\r\n".join(lines)


def _mut_rename(rng, text: str, idents: list[str]) -> str:
    present = [w for w in idents if w in text]
    if not present:
        return text + "\n"
    for w in rng.choice(present, size=min(len(present), int(rng.integers(1, 3))), replace=False):
        text = text.replace(str(w), _ident(rng))
    return text


def _mut_insert(rng, text: str) -> str:
    lines = text.split("\n")
    pos = int(rng.integers(0, len(lines)))
    lines.insert(pos, f"// note {_ident(rng)} reviewed")
    return "\n".join(lines)


def _mut_delete(rng, text: str) -> str:
    lines = text.split("\n")
    if len(lines) < 8:
        return text
    del lines[int(rng.integers(1, len(lines) - 1))]
    return "\n".join(lines)


def _mut_move(rng, text: str) -> str:
    blocks = text.split("\n\n")
    if len(blocks) < 3:
        return text
    i = int(rng.integers(0, len(blocks) - 1))
    blocks[i], blocks[i + 1] = blocks[i + 1], blocks[i]
    return "\n\n".join(blocks)


_MUTATIONS = [("ws", _mut_ws), ("rename", _mut_rename), ("insert", _mut_insert),
              ("delete", _mut_delete), ("move", _mut_move)]

TIERS = {"tiny": 120, "small": 2600, "bench": 100_000}


def generate_corpus(tier: str = "tiny", seed: int = 42, n_base: int | None = None,
                    shingle_k: int = 9) -> dict[str, pd.DataFrame]:
    """Build the corpus.  Returns {'files', 'truth_pairs', 'truth_clusters'}.

    Composition per FIXTURES.md §3: base population + exact copies +
    near-dup mutated copies + hard negatives (same template family,
    different vocab) + skew pathology (license header on ~30% of
    families; one vendored file copied near-exactly across many repos).
    """
    n_base = n_base if n_base is not None else TIERS[tier]
    rng = np.random.default_rng(seed)
    emitted: list[_Emitted] = []
    pairs: list[tuple[str, str, str, str, float]] = []  # key_a, key_b, relation, mutation, jacc

    def emit(repo: str, path: str, lang: str, content: str) -> _Emitted:
        e = _Emitted(repo, path, _commit(f"{repo}/{path}", seed), lang, content)
        emitted.append(e)
        return e

    def jacc(a: str, b: str) -> float:
        return K.exact_jaccard(K.shingle_hashes(a, shingle_k), K.shingle_hashes(b, shingle_k))

    n_repos = max(8, n_base // 24)

    def rand_repo() -> str:
        i = int(rng.integers(0, n_repos))
        return f"org{i % 37:04d}/repo{i:04d}"

    # --- base population (in template families for hard negatives) ---
    fam_id = 0
    base: list[tuple[_Emitted, list[str], str]] = []  # (row, idents, raw_text)
    while len(base) < n_base:
        fam_id += 1
        lang = LANGS[int(rng.integers(0, len(LANGS)))]
        nlines = int(np.exp(rng.uniform(np.log(12), np.log(220))))
        template = _template_lines(rng, lang, nlines)
        headered = rng.random() < 0.30  # skew pathology: shared license header
        fam_size = int(rng.integers(1, 4)) if rng.random() < 0.25 else 1  # hard-negative siblings
        for m in range(fam_size):
            if len(base) >= n_base:
                break
            idents = [_ident(rng) for _ in range(10)]
            body = _render(template, idents)
            content = (LICENSE_HEADER + body) if headered else body
            e = emit(rand_repo(), f"src/pkg{fam_id % 17}/mod_{fam_id}_{m}.{EXT[lang]}", lang, content)
            base.append((e, idents, content))

    # --- edge rows (tiny/small only; bench stays clean for throughput) ---
    if tier != "bench":
        emit("org0000/repo0000", "edge/empty.txt", "text", "")
        emit("org0000/repo0000", "edge/short.txt", "text", "hi\n")
        emit("org0000/repo0000", "edge/unicode.py", "python",
             "def héllo_wörld():\n    return '∑ € 漢字 🎉 Ω'\n")
        emit("org0000/repo0000", "edge/crlf.cc", "cpp", "int main() {\r\n  return 0;\r\n}\r\n")

    # --- exact duplicates: 10% of base get 1-4 byte-identical copies ---
    for e, idents, content in base:
        if rng.random() < 0.10:
            for c in range(int(rng.integers(1, 5))):
                d = emit(rand_repo(), f"vendor/{e.path.rsplit('/', 1)[-1][:-3]}_{c}.{EXT[e.lang]}",
                         e.lang, content)
                pairs.append((*sorted([e.key, d.key]), "exact", "copy", 1.0))

    # --- near duplicates: 25% of base get 1-3 mutated copies ---
    for e, idents, content in base:
        if rng.random() < 0.25:
            for c in range(int(rng.integers(1, 4))):
                name, fn = _MUTATIONS[int(rng.integers(0, len(_MUTATIONS)))]
                mutated = fn(rng, content, idents) if name == "rename" else fn(rng, content)
                j = jacc(content, mutated)
                # Keep truth comfortably above the b=16/r=8 LSH s-curve
                # (FIXTURES §3.3): at s=0.86 the per-pair miss prob is
                # ~0.3%, and transitivity pushes component recall >0.99.
                if j < 0.86:
                    name, mutated = "ws", _mut_ws(rng, content)
                    j = jacc(content, mutated)
                d = emit(rand_repo(), f"forks/f{c}_{e.path.rsplit('/', 1)[-1]}", e.lang, mutated)
                pairs.append((*sorted([e.key, d.key]), "near", name, j))

    # --- vendored library: one file copied near-exactly into many repos ---
    vend_rng = np.random.default_rng(seed + 7)
    vt = _render(_template_lines(vend_rng, "cpp", 90), [_ident(vend_rng) for _ in range(10)])
    vendor_master = emit("org0001/repo0001", "third_party/libfoo/libfoo.cc", "cpp", vt)
    n_vendor = max(6, n_base // 40)
    for c in range(n_vendor):
        vmut = _mut_ws(vend_rng, vt) if vend_rng.random() < 0.5 else _mut_insert(vend_rng, vt)
        d = emit(f"org{c % 37:04d}/repo{c:04d}", f"third_party/libfoo_{c}.cc", "cpp", vmut)
        pairs.append((*sorted([vendor_master.key, d.key]), "near", "vendored", jacc(vt, vmut)))

    # --- tables, stable order ---
    files = pd.DataFrame(
        [(e.repo, e.path, e.commit, e.lang, e.content) for e in emitted],
        columns=["repo", "path", "commit", "lang", "content"],
    ).sort_values(["repo", "path", "commit"], ignore_index=True)
    assert not files.duplicated(["repo", "path", "commit"]).any(), "key uniqueness"

    truth_pairs = pd.DataFrame(
        pairs, columns=["a", "b", "relation", "mutation", "expected_jaccard"]
    ).drop_duplicates(["a", "b"]).sort_values(["a", "b"], ignore_index=True)

    truth_clusters = _closure(truth_pairs)
    return {"files": files, "truth_pairs": truth_pairs, "truth_clusters": truth_clusters}


def _closure(truth_pairs: pd.DataFrame) -> pd.DataFrame:
    """Union-find transitive closure over non-boilerplate truth pairs."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for _, r in truth_pairs.iterrows():
        if r.relation != "boilerplate":
            ra, rb = find(r.a), find(r.b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    rows = sorted((k, find(k)) for k in parent)
    out = pd.DataFrame(rows, columns=["key", "root"])
    roots = {r: i for i, r in enumerate(sorted(out.root.unique()))}
    out["truth_cluster_id"] = out.root.map(roots).astype("int64")
    return out[["key", "truth_cluster_id"]]


def write_corpus(out_dir: str, tier: str = "tiny", seed: int = 42,
                 n_base: int | None = None) -> dict[str, str]:
    """Materialize to parquet; returns {table: path}."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    tables = generate_corpus(tier=tier, seed=seed, n_base=n_base)
    paths = {}
    for name, pdf in tables.items():
        p = f"{out_dir}/{name}.parquet"
        pdf.to_parquet(p, index=False)
        paths[name] = p
    return paths
