#!/usr/bin/env python
"""Assemble a real-text training corpus from documentation shipped with
installed Python packages (markdown/rst files + module docstrings):
genuine human-written English technical prose, the only sizable natural
text available in a hermetic image.

Documents are separated by <|endoftext|> — the same delimiter the
perplexity harness splits on (reference: perplexity.h:119-135) — so the
corpus doubles as a perplexity dataset. A deterministic tail fraction is
held out as the validation split.

Usage: python tools/build_corpus.py --out /tmp/corpus [--max-mb 12]
"""

import argparse
import ast
import glob
import os
import sys

PACKAGES = ["numpy", "scipy", "jax", "pandas", "sklearn", "torch",
            "transformers", "matplotlib", "sympy", "networkx", "PIL",
            "seaborn", "statsmodels", "nltk", "flax", "optax"]

SEP = "<|endoftext|>"


def iter_docfiles(roots):
    for root in roots:
        for pat in ("**/*.md", "**/*.rst"):
            yield from glob.glob(os.path.join(root, pat), recursive=True)


def docstrings_from_py(path: str):
    """Module/class/function docstrings, longest-first filtered to prose
    (skips doctest-heavy and table-like strings)."""
    try:
        with open(path, encoding="utf-8", errors="ignore") as f:
            tree = ast.parse(f.read())
    except (SyntaxError, ValueError, RecursionError):
        return
    for node in ast.walk(tree):
        if isinstance(node, (ast.Module, ast.ClassDef, ast.FunctionDef,
                             ast.AsyncFunctionDef)):
            doc = ast.get_docstring(node, clean=True)
            if doc and len(doc) > 400:
                yield doc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--max-mb", type=float, default=12.0)
    ap.add_argument("--valid-frac", type=float, default=0.02)
    args = ap.parse_args()

    import importlib.util

    roots = []
    for pkg in PACKAGES:
        spec = importlib.util.find_spec(pkg)
        if spec and spec.submodule_search_locations:
            roots.append(list(spec.submodule_search_locations)[0])

    docs: list[str] = []
    seen: set[int] = set()
    total = 0
    budget = int(args.max_mb * 1e6)

    def add(text: str):
        nonlocal total
        text = text.strip()
        h = hash(text)
        if len(text) < 400 or h in seen:
            return
        seen.add(h)
        docs.append(text)
        total += len(text)

    for f in sorted(iter_docfiles(roots)):
        try:
            with open(f, encoding="utf-8", errors="ignore") as fh:
                add(fh.read())
        except OSError:
            continue
        if total > budget:
            break
    if total < budget:
        for root in roots:
            for f in sorted(glob.glob(os.path.join(root, "**/*.py"),
                                      recursive=True)):
                for doc in docstrings_from_py(f):
                    add(doc)
                    if total > budget:
                        break
                if total > budget:
                    break
            if total > budget:
                break

    os.makedirs(args.out, exist_ok=True)
    n_valid = max(2, int(len(docs) * args.valid_frac))
    # deterministic interleaved holdout (docs arrive grouped by package;
    # a tail split would make validation all-one-package)
    valid = docs[:: max(len(docs) // n_valid, 1)][:n_valid]
    vset = {id(d) for d in valid}
    train = [d for d in docs if id(d) not in vset]
    for name, split in (("train.txt", train), ("valid.txt", valid)):
        with open(os.path.join(args.out, name), "w", encoding="utf-8") as f:
            f.write(SEP.join(split))
    print(f"corpus: {len(train)} train docs ({sum(map(len, train))/1e6:.1f}"
          f" MB), {len(valid)} valid docs "
          f"({sum(map(len, valid))/1e6:.2f} MB)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
