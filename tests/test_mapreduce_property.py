"""Property-based fidelity: MapReduceJob reproduces a pure-Python
simulation of the reference dataflow on ARBITRARY inputs, not just the
golden fixture — and the combiner (reduceByKey) path agrees with the
faithful holistic (groupByKey) path whenever the reduce is associative.

Each hypothesis example runs real Spark jobs, so examples are capped and
the deadline disabled (JVM scheduling jitter would trip it)."""

from __future__ import annotations

import re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lua_mapreduce_spark.mapreduce import MapReduceJob

_TEXTS = st.lists(
    st.text(
        alphabet=st.characters(codec="ascii", categories=("L", "N", "P", "Z")),
        max_size=60,
    ),
    min_size=0,
    max_size=6,
)


def _python_simulation(texts: list[str]) -> dict[str, int]:
    """The reference semantics in plain Python: whitespace split,
    alphabetic-run extract, lowercase, count (word-count-taskfile.lua
    :105-153)."""
    counts: Counter[str] = Counter()
    for text in texts:
        for token in text.split():
            for word in re.findall(r"[A-Za-z]+", token):
                counts[word.lower()] += 1
    return dict(counts)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_TEXTS)
def test_wordcount_matches_python_simulation(spark, texts):
    fixtures = {f"f{i}.txt": t for i, t in enumerate(texts)}

    def taskfn(arg):
        yield from fixtures.items()

    def mapfn(key, value):
        for token in value.split():
            for word in re.findall(r"[A-Za-z]+", token):
                yield word.lower(), 1

    def reducefn(key, values):
        yield key, len(values)

    holistic = MapReduceJob(taskfn=taskfn, mapfn=mapfn, reducefn=reducefn)
    expected = _python_simulation(texts)
    assert holistic.run(spark) == expected

    def sum_reduce(key, values):
        yield key, sum(values)

    combined = MapReduceJob(
        taskfn=taskfn, mapfn=mapfn, reducefn=sum_reduce, combinefn=lambda a, b: a + b
    )
    assert combined.run(spark) == expected
