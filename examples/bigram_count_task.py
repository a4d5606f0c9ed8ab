"""Bigram-count task file: adjacent word pairs with combiner + filter.

Built to COMPOSE with ``frequent_words_task.py`` in one CLI run — the
reference's README TODOs #3 and #4 together ("pass multiple task files",
"more examples", /root/reference/README.md:50-51) plus the post-reduce
filter of TODO #5 (:52): both task files accept the same
``<dir>:<min_count>`` argument, so

::

    python -m lua_mapreduce_spark \
        -t examples/frequent_words_task.py \
        -t examples/bigram_count_task.py -a testdir:2

runs unigram AND bigram thresholds on ONE Spark session. Output key
spaces stay disjoint by construction (bigram keys contain a space, word
keys never do — both tokenizers emit alphabetic runs only), so the
combined stdout stream is unambiguous.

Slots exercised: selective per-line mapfn (lines with fewer than two
tokens emit nothing), ``combinefn`` map-side partial aggregation, and an
executor-side ``filterfn`` threshold.
"""

from __future__ import annotations

import os
import re

_MIN_COUNT = 2  # rebound by taskfn from the -a argument


def taskfn(arg):
    # taskfn runs driver-side BEFORE the closures are pickled, so the
    # module global captured by filterfn is bound here (the
    # frequent_words_task convention).
    global _MIN_COUNT
    directory, sep, min_count = arg.rpartition(":")
    if not sep or not directory or not min_count.isdigit():
        raise SystemExit("bigram_count_task expects -a '<dir>:<min_count>'")
    _MIN_COUNT = int(min_count)
    for name in sorted(os.listdir(directory)):
        if name.endswith(".txt"):
            path = os.path.join(directory, name)
            yield path, path


def mapfn(key, value):
    with open(value, encoding="utf-8") as fh:
        for line in fh:
            words = [
                w.lower()
                for token in line.split()
                for w in re.findall(r"[A-Za-z]+", token)
            ]
            for w1, w2 in zip(words, words[1:]):
                yield f"{w1} {w2}", 1


def combinefn(a, b):
    return a + b


def reducefn(key, values):
    yield key, sum(values)


def filterfn(key, value):
    return value >= _MIN_COUNT
