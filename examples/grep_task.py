"""Grep-count task file for ``python -m lua_mapreduce_spark -t``.

Demonstrates the two slots the reference API supports but its shipped
example never exercises (word-count-taskfile.lua only maps+counts):

* a SELECTIVE mapfn — emits nothing for non-matching lines (the
  reference contract allows empty map output per task);
* combinefn — associative pairwise merge enabling map-side partial
  aggregation before the shuffle (the scale lever the reference's raw
  pair shipping lacks, lua-mapreduce-client.lua:168-175).

``-a`` is ``<dir>:<pattern>``; counts matching LINES per file::

    python -m lua_mapreduce_spark -t examples/grep_task.py -a testdir:error
"""

from __future__ import annotations

import os


def taskfn(arg):
    directory, sep, pattern = arg.rpartition(":")
    if not sep or not directory:
        raise SystemExit("grep_task expects -a '<dir>:<pattern>'")
    for name in sorted(os.listdir(directory)):
        if name.endswith(".txt"):
            path = os.path.join(directory, name)
            yield path, pattern


def mapfn(key, value):
    with open(key, encoding="utf-8") as fh:
        for line in fh:
            if value in line:
                yield os.path.basename(key), 1


def combinefn(a, b):
    return a + b


def reducefn(key, values):
    yield key, sum(values)
