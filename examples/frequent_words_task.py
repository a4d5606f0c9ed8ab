"""Frequent-words task file: word count plus a POST-REDUCE filter.

Exercises ``filterfn`` — the reference's README TODO #5 ("Add support for
filter after reduce is performed", /root/reference/README.md:52), the one
roadmap item its engine never shipped. The pipeline is the reference's
word count (example/word-count-taskfile.lua:73-159) with a declarative
post-reduce threshold: only words appearing at least ``N`` times survive
to finalfn/output. The filter runs executor-side, so discarded words
never reach the driver.

``-a`` is ``<dir>:<min_count>``::

    python -m lua_mapreduce_spark -t examples/frequent_words_task.py -a testdir:3
"""

from __future__ import annotations

import os
import re

_MIN_COUNT = 2  # rebound by taskfn from the -a argument


def taskfn(arg):
    # taskfn runs driver-side BEFORE the map/reduce/filter closures are
    # pickled to executors, so parsing -a here binds the module global the
    # (pickled-by-value) filterfn captures.
    global _MIN_COUNT
    directory, sep, min_count = arg.rpartition(":")
    if not sep or not directory or not min_count.isdigit():
        raise SystemExit("frequent_words_task expects -a '<dir>:<min_count>'")
    _MIN_COUNT = int(min_count)
    for name in sorted(os.listdir(directory)):
        if name.endswith(".txt"):
            path = os.path.join(directory, name)
            yield path, path


def mapfn(key, value):
    with open(value, encoding="utf-8") as fh:
        for line in fh:
            for token in line.split():
                for word in re.findall(r"[A-Za-z]+", token):
                    yield word.lower(), 1


def reducefn(key, values):
    yield key, len(values)


def filterfn(key, value):
    return value >= _MIN_COUNT
