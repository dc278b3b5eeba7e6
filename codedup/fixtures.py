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
                    shingle_k: int = 9, n_hot_family: int = 0) -> dict[str, pd.DataFrame]:
    """Build the corpus.  Returns {'files', 'truth_pairs', 'truth_clusters'}.

    Composition per FIXTURES.md §3: base population + exact copies +
    near-dup mutated copies + hard negatives (same template family,
    different vocab) + skew pathology (license header on ~30% of
    families; one vendored file copied near-exactly across many repos).

    ``n_hot_family`` > 0 additionally injects the adversarial vendored-
    boilerplate pathology (SURVEY §4.2.2, VERDICT r3 #5): that many
    near-identical variants of ONE boilerplate file, spread across
    repos — every variant lands in the same LSH band buckets, so an
    unguarded candidate join would fan out n_hot_family^2 pairs.  All
    variants are truth near-dups of the master (one truth cluster).
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

    # --- adversarial hot family (opt-in): one boilerplate, many repos ---
    if n_hot_family:
        hot_rng = np.random.default_rng(seed + 13)
        ht = _render(_template_lines(hot_rng, "text", 40),
                     [_ident(hot_rng) for _ in range(10)])
        hot_master = emit("org0002/repo0002", "legal/NOTICE_0.txt", "text", ht)
        for c in range(1, n_hot_family):
            hm = _mut_ws(hot_rng, ht) if hot_rng.random() < 0.7 else _mut_insert(hot_rng, ht)
            j = jacc(ht, hm)
            if j < 0.86:          # keep truth above the LSH s-curve floor
                hm = _mut_ws(hot_rng, ht)
                j = jacc(ht, hm)
            d = emit(f"org{c % 37:04d}/repo{(c * 7) % 9973:04d}",
                     f"legal/NOTICE_{c}.txt", "text", hm)
            pairs.append((*sorted([hot_master.key, d.key]), "near", "hot_family", j))

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


def generate_embeddings(n: int, dim: int = 64, seed: int = 42,
                        n_latent: int = 200, dup_frac: float = 0.05,
                        ) -> dict[str, pd.DataFrame]:
    """Deterministic embedding corpus with planted near-dup structure,
    for the ANN/SemDeDup scale tiers (VERDICT r3 missing #1: every
    embedding operator was proven only at 2,000 sf-table vectors).

    Structure: vectors are drawn around ``n_latent`` latent cluster
    centers (so an IVF coarse quantizer has real cells to find), and
    ``dup_frac`` of them get one near-duplicate copy (small additive
    noise, cosine >= ~0.99) — the planted truth for recall/drop-rate
    accounting.  Pure function of (n, dim, seed); float32; generation
    is chunked numpy so 10^6 x 64 stays ~300 MB.

    Returns {'embeddings': (vec_id, label, embedding),
             'truth_dups':  (a, b) planted near-dup pairs}."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_latent, dim)).astype(np.float32) * 4.0
    n_dups = int(n * dup_frac)
    n_base_v = n - n_dups

    assign = rng.integers(0, n_latent, n_base_v)
    base = centers[assign] + rng.standard_normal((n_base_v, dim)).astype(np.float32)
    # planted near-dups: copy of a base vector + tiny noise (cos ~0.999)
    src = rng.choice(n_base_v, size=n_dups, replace=False)
    dups = base[src] + 0.05 * rng.standard_normal((n_dups, dim)).astype(np.float32)

    emb = np.concatenate([base, dups]).astype(np.float32)
    labels = np.concatenate([assign % 10, assign[src] % 10]).astype(np.int64)
    vec_ids = np.arange(n, dtype=np.int64)
    truth = pd.DataFrame({
        "a": src.astype(np.int64),
        "b": (n_base_v + np.arange(n_dups)).astype(np.int64),
    }).sort_values(["a", "b"], ignore_index=True)
    table = pd.DataFrame({
        "vec_id": vec_ids,
        "label": labels,
        "embedding": list(emb),   # pandas holds row views; pyarrow writes list<float>
    })
    return {"embeddings": table, "truth_dups": truth}


def write_embeddings(out_dir: str, n: int, dim: int = 64, seed: int = 42,
                     **kw) -> dict[str, str]:
    """Materialize the embedding tier to parquet (chunked writer: the
    1M-row list column is written in row groups, never one giant
    buffer).  Returns {table: path}."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    tables = generate_embeddings(n, dim=dim, seed=seed, **kw)
    paths = {}
    for name, pdf in tables.items():
        p = f"{out_dir}/{name}.parquet"
        if name == "embeddings":
            schema = pa.schema([
                ("vec_id", pa.int64()), ("label", pa.int64()),
                ("embedding", pa.list_(pa.float32())),
            ])
            with pq.ParquetWriter(p, schema) as w:
                for lo in range(0, len(pdf), 100_000):
                    chunk = pdf.iloc[lo:lo + 100_000]
                    w.write_table(pa.Table.from_pandas(chunk, schema=schema,
                                                       preserve_index=False))
        else:
            pdf.to_parquet(p, index=False)
        paths[name] = p
    return paths


def write_corpus(out_dir: str, tier: str = "tiny", seed: int = 42,
                 n_base: int | None = None, n_hot_family: int = 0) -> dict[str, str]:
    """Materialize to parquet; returns {table: path}."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    tables = generate_corpus(tier=tier, seed=seed, n_base=n_base,
                             n_hot_family=n_hot_family)
    paths = {}
    for name, pdf in tables.items():
        p = f"{out_dir}/{name}.parquet"
        pdf.to_parquet(p, index=False)
        paths[name] = p
    return paths
