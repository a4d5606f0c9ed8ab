"""End-to-end test of the task-file CLI runner: ``python -m
lua_mapreduce_spark -t examples/wordcount_task.py -a <dir>`` reproduces the
reference's golden word-count (FIXTURES.md §1) through a real subprocess —
argument parsing, task-module loading, closure shipping to executors, and
stdout sink all exercised the way a user would."""

from __future__ import annotations

import os
import pathlib
import subprocess
import sys

from tests.test_mapreduce_api import FIXTURES, GOLDEN

_REPO = pathlib.Path(__file__).resolve().parents[1]


def test_cli_wordcount_matches_reference_golden(tmp_path):
    for name, text in FIXTURES.items():
        (tmp_path / name).write_text(text, encoding="utf-8")

    env = dict(os.environ)
    env["PYTHONPATH"] = str(_REPO) + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "lua_mapreduce_spark",
            "-t",
            str(_REPO / "examples" / "wordcount_task.py"),
            "-a",
            str(tmp_path),
            "--master",
            "local[2]",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=str(_REPO),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    got = {}
    for line in proc.stdout.splitlines():
        if "\t" in line:
            word, count = line.split("\t")
            got[word] = int(count)
    assert got == GOLDEN


def test_cli_output_parquet_sink(spark, tmp_path):
    """-o writes the reduce output as parquet through the distributed sink
    (to_dataframe): results never touch the driver. Run in-process against
    the shared session via run_task_file."""
    from lua_mapreduce_spark.__main__ import build_parser, load_task_module, run_task_file

    for name, text in FIXTURES.items():
        (tmp_path / name).write_text(text, encoding="utf-8")
    out = str(tmp_path / "wc_out")
    args = build_parser().parse_args(
        [
            "-t",
            str(_REPO / "examples" / "wordcount_task.py"),
            "-a",
            str(tmp_path),
            "-o",
            out,
        ]
    )
    mod = load_task_module(args.task_file[0])  # -t is repeatable: a list
    run_task_file(mod, args, spark)
    got = {r.key: r.value for r in spark.read.parquet(out).collect()}
    assert got == GOLDEN


def test_cli_rejects_task_file_without_mapfn(tmp_path):
    bad = tmp_path / "bad_task.py"
    bad.write_text("def taskfn(arg):\n    yield 'k', 'v'\n", encoding="utf-8")
    env = dict(os.environ)
    env["PYTHONPATH"] = str(_REPO) + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-m", "lua_mapreduce_spark", "-t", str(bad)],
        capture_output=True,
        text=True,
        timeout=120,
        env=env,
        cwd=str(_REPO),
    )
    assert proc.returncode != 0
    assert "mapfn" in proc.stderr


def test_cli_num_workers_rewrites_local_master(tmp_path):
    """-n N (the reference client's worker-count flag) pins a local master
    to local[N]; a subprocess run with -n 2 completes and matches the
    golden output, proving the rewritten master is valid."""
    for name, text in FIXTURES.items():
        (tmp_path / name).write_text(text, encoding="utf-8")

    env = dict(os.environ)
    env["PYTHONPATH"] = str(_REPO) + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "lua_mapreduce_spark",
            "-t",
            str(_REPO / "examples" / "wordcount_task.py"),
            "-a",
            str(tmp_path),
            "-n",
            "2",
            "-l",
            "error",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=str(_REPO),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    got = {}
    for line in proc.stdout.splitlines():
        if "\t" in line:
            word, count = line.split("\t")
            got[word] = int(count)
    assert got == GOLDEN


def test_cli_num_workers_validation():
    from lua_mapreduce_spark.__main__ import build_parser

    args = build_parser().parse_args(["-t", "x.py", "-n", "4"])
    assert args.num_workers == 4


def test_cli_loglevel_flag_parses_and_rejects_junk():
    """-l mirrors the reference server's loglevel flag
    (lua-mapreduce-server.lua:355): known levels parse, junk is a usage
    error (argparse choices -> SystemExit)."""
    import pytest

    from lua_mapreduce_spark.__main__ import build_parser

    args = build_parser().parse_args(["-t", "x.py", "-l", "warn"])
    assert args.loglevel == "warn"
    with pytest.raises(SystemExit):
        build_parser().parse_args(["-t", "x.py", "-l", "loud"])


def test_resolve_master_rewrites_plain_local_only():
    """-n must rewrite plain local masters and leave local-cluster (a
    distributed-simulation master) and real cluster URLs untouched."""
    from lua_mapreduce_spark.__main__ import resolve_master

    assert resolve_master("local[*]", 4) == "local[4]"
    assert resolve_master("local", 2) == "local[2]"
    assert resolve_master("local[3]", 8) == "local[8]"
    assert resolve_master("local-cluster[2,1,1024]", 4) == "local-cluster[2,1,1024]"
    assert resolve_master("spark://host:7077", 4) == "spark://host:7077"
    assert resolve_master("local[*]", None) == "local[*]"


def test_cli_grep_task_selective_map_and_combiner(tmp_path):
    """The grep example exercises selective mapfn (files with zero matches
    emit nothing) and combinefn through the real CLI."""
    (tmp_path / "a.txt").write_text("error one\nok\nerror two\n", encoding="utf-8")
    (tmp_path / "b.txt").write_text("all fine here\n", encoding="utf-8")
    (tmp_path / "c.txt").write_text("error again\n", encoding="utf-8")

    env = dict(os.environ)
    env["PYTHONPATH"] = str(_REPO) + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "lua_mapreduce_spark",
            "-t",
            str(_REPO / "examples" / "grep_task.py"),
            "-a",
            f"{tmp_path}:error",
            "--master",
            "local[2]",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=str(_REPO),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    got = dict(
        line.split("\t") for line in proc.stdout.splitlines() if "\t" in line
    )
    assert got == {"a.txt": "2", "c.txt": "1"}


def test_grep_task_rejects_malformed_arg():
    """grep_task -a without the <dir>:<pattern> separator must die with a
    usage message, not an opaque os.listdir('') FileNotFoundError."""
    import pytest

    from lua_mapreduce_spark.__main__ import load_task_module

    mod = load_task_module(str(_REPO / "examples" / "grep_task.py"))
    with pytest.raises(SystemExit, match="<dir>:<pattern>"):
        list(mod.taskfn("no-separator-here"))


def test_cli_multiple_task_files_one_session(tmp_path):
    """Reference TODO #3 (README.md:50): several -t task files run in
    sequence on ONE session; both outputs appear on stdout (doc stats'
    fixed key space + word count's golden words)."""
    for name, text in FIXTURES.items():
        (tmp_path / name).write_text(text, encoding="utf-8")

    env = dict(os.environ)
    env["PYTHONPATH"] = str(_REPO) + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "lua_mapreduce_spark",
            "-t",
            str(_REPO / "examples" / "docstats_task.py"),
            "-t",
            str(_REPO / "examples" / "wordcount_task.py"),
            "-a",
            str(tmp_path),
            "--master",
            "local[2]",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=str(_REPO),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    got = {}
    for line in proc.stdout.splitlines():
        if "\t" in line:
            k, v = line.split("\t")
            got[k] = int(v)
    # word count's golden pairs all present
    for w, c in GOLDEN.items():
        assert got.get(w) == c
    # doc stats: 3 fixture files; totals consistent with the fixtures
    assert got["files"] == len(FIXTURES)
    assert got["words"] == sum(len(t.split()) for t in FIXTURES.values())


def test_cli_filterfn_post_reduce(tmp_path):
    """Reference TODO #5 (README.md:52, 'filter after reduce'): the
    frequent_words task file's filterfn drops reduce-output pairs below
    the -a threshold before they reach stdout."""
    for name, text in FIXTURES.items():
        (tmp_path / name).write_text(text, encoding="utf-8")

    env = dict(os.environ)
    env["PYTHONPATH"] = str(_REPO) + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "lua_mapreduce_spark",
            "-t",
            str(_REPO / "examples" / "frequent_words_task.py"),
            "-a",
            f"{tmp_path}:2",
            "--master",
            "local[2]",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=str(_REPO),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    got = {}
    for line in proc.stdout.splitlines():
        if "\t" in line:
            word, count = line.split("\t")
            got[word] = int(count)
    assert got == {w: c for w, c in GOLDEN.items() if c >= 2}


def test_cli_duplicate_task_stems_with_output_rejected(tmp_path):
    """Two -t files sharing a basename stem plus -o would overwrite each
    other's <output>/<stem> dir: the CLI must fail fast, before any task
    (or session) starts."""
    for sub in ("a", "b"):
        d = tmp_path / sub
        d.mkdir()
        (d / "job.py").write_text(
            "def taskfn(arg):\n    yield 'k', 1\n"
            "def mapfn(k, v):\n    yield k, v\n",
            encoding="utf-8",
        )
    env = dict(os.environ)
    env["PYTHONPATH"] = str(_REPO) + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "lua_mapreduce_spark",
            "-t",
            str(tmp_path / "a" / "job.py"),
            "-t",
            str(tmp_path / "b" / "job.py"),
            "-o",
            str(tmp_path / "out"),
        ],
        capture_output=True,
        text=True,
        timeout=120,
        env=env,
        cwd=str(_REPO),
    )
    assert proc.returncode != 0
    assert "duplicate task-file stem" in proc.stderr


def test_cli_inverted_index_task(tmp_path):
    """The inverted-index example composes all Layer-A slots: structure-
    building reducefn + post-reduce filterfn; stdout carries only terms
    appearing in >= 2 fixture documents, with sorted distinct postings."""
    from collections import defaultdict

    for name, text in FIXTURES.items():
        (tmp_path / name).write_text(text, encoding="utf-8")

    env = dict(os.environ)
    env["PYTHONPATH"] = str(_REPO) + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "lua_mapreduce_spark",
            "-t",
            str(_REPO / "examples" / "inverted_index_task.py"),
            "-a",
            str(tmp_path),
            "--master",
            "local[2]",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=str(_REPO),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    got = {}
    for line in proc.stdout.splitlines():
        if "\t" in line:
            word, postings = line.split("\t")
            got[word] = postings
    import re as _re

    index = defaultdict(set)
    for fname, text in FIXTURES.items():
        for token in text.split():
            for w in _re.findall(r"[A-Za-z]+", token):
                index[w.lower()].add(fname)
    expect = {
        w: ",".join(sorted(docs)) for w, docs in index.items() if len(docs) >= 2
    }
    assert got == expect and got


def test_cli_composed_multi_task_with_filterfn(tmp_path):
    """Reference TODOs #3 + #5 COMPOSED in one end-to-end run: two task
    files on ONE session, each applying its own post-reduce filterfn —
    frequent words (unigram threshold) and frequent bigrams (bigram
    threshold with combiner). Key spaces are disjoint by construction
    (bigram keys contain a space), so the combined stdout is asserted
    exactly against both expectations replayed in-test."""
    import re as _re
    from collections import Counter

    for name, text in FIXTURES.items():
        (tmp_path / name).write_text(text, encoding="utf-8")

    env = dict(os.environ)
    env["PYTHONPATH"] = str(_REPO) + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "lua_mapreduce_spark",
            "-t",
            str(_REPO / "examples" / "frequent_words_task.py"),
            "-t",
            str(_REPO / "examples" / "bigram_count_task.py"),
            "-a",
            f"{tmp_path}:2",
            "--master",
            "local[2]",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=str(_REPO),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    got_words, got_bigrams = {}, {}
    for line in proc.stdout.splitlines():
        if "\t" not in line:
            continue
        k, v = line.split("\t")
        (got_bigrams if " " in k else got_words)[k] = int(v)
    # unigram side: the golden counts, thresholded at 2
    assert got_words == {w: c for w, c in GOLDEN.items() if c >= 2}
    # bigram side: per-line adjacent pairs replayed from the fixtures
    bigrams: Counter = Counter()
    for text in FIXTURES.values():
        for line in text.splitlines():
            ws = [
                w.lower()
                for token in line.split()
                for w in _re.findall(r"[A-Za-z]+", token)
            ]
            bigrams.update(zip(ws, ws[1:]))
    expect = {
        f"{a} {b}": c for (a, b), c in bigrams.items() if c >= 2
    }
    assert got_bigrams == expect
    # the composed run must exercise BOTH filters non-vacuously: each
    # side dropped at least one pair
    assert len(got_words) < len(GOLDEN)
    assert len(got_bigrams) < len(bigrams)
