"""Word-count task file for ``python -m lua_mapreduce_spark -t``.

Port of the reference's only shipped example
(/root/reference/example/word-count-taskfile.lua:73-159): taskfn walks a
directory of .txt files (:82-88), mapfn tokenizes on whitespace then
extracts lowercase alphabetic runs and emits (word, 1) (:105-144), reducefn
counts the grouped values (:150-153 — COUNT of the list, not SUM).

Run::

    python -m lua_mapreduce_spark -t examples/wordcount_task.py -a <dir>
"""

from __future__ import annotations

import os
import re


def taskfn(arg):
    """One map task per .txt file in the directory ``arg``; the value is
    the file path — workers read the bytes, the driver never does (the
    reference's clients likewise read their shard themselves)."""
    for name in sorted(os.listdir(arg)):
        if name.endswith(".txt"):
            path = os.path.join(arg, name)
            yield path, path


def mapfn(key, value):
    with open(value, encoding="utf-8") as fh:
        for line in fh:
            for token in line.split():
                for word in re.findall(r"[A-Za-z]+", token):
                    yield word.lower(), 1


def reducefn(key, values):
    yield key, len(values)
