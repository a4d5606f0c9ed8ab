"""Corpus-statistics task file for ``python -m lua_mapreduce_spark -t``.

The reference's README asks for "more example[s] of task-files"
(/root/reference/README.md:51, TODO #4); this one exercises a different
dataflow shape than word count: mapfn emits a FIXED small key space
(per-metric totals), so the shuffle collapses to a handful of reduce
groups — the aggregation-heavy profile, vs word count's wide key space.

Emits, over every .txt file in the directory ``arg``:

* ``files``  — number of input files
* ``lines``  — total line count
* ``words``  — total whitespace-token count
* ``chars``  — total character count (excluding newlines)

Run (optionally alongside other tasks on one session — TODO #3)::

    python -m lua_mapreduce_spark -t examples/docstats_task.py \\
        -t examples/wordcount_task.py -a <dir>
"""

from __future__ import annotations

import os


def taskfn(arg):
    for name in sorted(os.listdir(arg)):
        if name.endswith(".txt"):
            path = os.path.join(arg, name)
            yield path, path


def mapfn(key, value):
    yield "files", 1
    with open(value, encoding="utf-8") as fh:
        for line in fh:
            stripped = line.rstrip("\n")
            yield "lines", 1
            yield "words", len(stripped.split())
            yield "chars", len(stripped)


def reducefn(key, values):
    yield key, sum(values)
