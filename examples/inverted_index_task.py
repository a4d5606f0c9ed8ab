"""Inverted-index task file for ``python -m lua_mapreduce_spark -t``.

A fourth reference-shaped example (reference TODO #4, README.md:51 "Add
more example of task-files") composing every Layer-A slot the engine
supports: directory-scan taskfn (word-count-taskfile.lua:82-88 shape),
tokenizing mapfn with the reference's exact tokenization (:105-144),
a reducefn whose OUTPUT VALUE is a built structure (the sorted
document-posting list as a comma-joined string — reduce emits a different
value shape than its inputs, lua-mapreduce-client.lua:195-197 semantics),
and a post-reduce filterfn (README TODO #5) dropping hapax terms.

``-a`` is a directory of ``.txt`` files::

    python -m lua_mapreduce_spark -t examples/inverted_index_task.py -a testdir
"""

from __future__ import annotations

import os
import re


def taskfn(arg):
    for name in sorted(os.listdir(arg)):
        if name.endswith(".txt"):
            yield name, os.path.join(arg, name)


def mapfn(key, value):
    with open(value, encoding="utf-8") as fh:
        for line in fh:
            for token in line.split():
                for word in re.findall(r"[A-Za-z]+", token):
                    yield word.lower(), key


def reducefn(key, values):
    # Postings: sorted distinct documents containing the term.
    yield key, ",".join(sorted(set(values)))


def filterfn(key, value):
    # Keep only terms appearing in >= 2 documents (hapax terms carry no
    # linking signal) — the post-reduce filter the reference's roadmap
    # asked for but never shipped.
    return value.count(",") >= 1
