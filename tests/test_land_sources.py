"""End-to-end landing test for tools/land_sources.py: a real (synthetic) git
repo's merge log and a file://-served sizes.json flow through the tool into
the landing zone and on through the engine's parse / incremental-refresh
paths (reference rg.py:86-104, 182-209 behavior, re-homed to the ops side)."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from land_sources import (  # noqa: E402
    land_build_stats,
    land_commit_log,
    main as land_main,
)


def _git(repo: Path, *args: str) -> str:
    return subprocess.run(
        ["git", "-C", str(repo), *args],
        check=True, capture_output=True, text=True,
        env={
            "GIT_AUTHOR_NAME": "t", "GIT_AUTHOR_EMAIL": "t@x",
            "GIT_COMMITTER_NAME": "t", "GIT_COMMITTER_EMAIL": "t@x",
            "GIT_AUTHOR_DATE": "2024-03-01T12:00:00+01:00",
            "GIT_COMMITTER_DATE": "2024-03-01T12:00:00+01:00",
            "PATH": "/usr/bin:/bin:/usr/local/bin",
            "HOME": str(repo.parent),
        },
    ).stdout


@pytest.fixture()
def riot_clone(tmp_path):
    """A git repo with two --no-ff merge commits carrying PR-style subjects
    (the shape the reference's get_commits_* walks)."""
    repo = tmp_path / "riot"
    repo.mkdir()
    _git(repo, "init", "-q", "-b", "master")
    (repo / "f.txt").write_text("base\n")
    _git(repo, "add", "f.txt")
    _git(repo, "commit", "-q", "-m", "initial")
    for i, pr in enumerate((19988, 20001)):
        _git(repo, "checkout", "-q", "-b", f"pr{pr}")
        (repo / f"pr{pr}.txt").write_text("x\n")
        _git(repo, "add", f"pr{pr}.txt")
        _git(repo, "commit", "-q", "-m", f"feature {i}")
        _git(repo, "checkout", "-q", "master")
        _git(repo, "merge", "-q", "--no-ff", "-m",
             f"Merge pull request #{pr} from riot/pr{pr}", f"pr{pr}")
    return repo


def test_commit_log_lands_and_parses(spark, tmp_path, riot_clone):
    from riot_graphs_spark.sources.commits import parse_commit_log

    landing = tmp_path / "landing"
    out = land_commit_log(str(riot_clone), str(landing))
    assert out.exists() and out.parent.name == "commits"

    parsed = parse_commit_log(spark.read.text(str(out.parent))).collect()
    assert len(parsed) == 2  # merges only, not the 3 feature/initial commits
    want = set(_git(riot_clone, "rev-list", "--merges", "HEAD").split())
    assert {r["hash"] for r in parsed} == want
    assert {r["msg"] for r in parsed} == {
        "Merge pull request #19988 from riot/pr19988",
        "Merge pull request #20001 from riot/pr20001",
    }
    assert all(r["date"] is not None for r in parsed)


def test_commit_log_since_sha_delta(tmp_path, riot_clone):
    first_merge = _git(riot_clone, "rev-list", "--merges", "HEAD").split()[-1]
    landing = tmp_path / "landing"
    out = land_commit_log(
        str(riot_clone), str(landing), name="delta", since_sha=first_merge
    )
    lines = [l for l in out.read_text().splitlines() if l]
    assert len(lines) == 1  # only the merge AFTER first_merge
    assert "#20001" in lines[0]


def test_sizes_land_and_refresh(spark, tmp_path):
    from riot_graphs_spark.streaming.ingest import incremental_refresh

    # Serve a sizes.json over file:// in the CI server's path layout.
    sha = "deadbeef"
    ci = tmp_path / "ci"
    build_dir = ci / "RIOT-OS" / "RIOT" / "master" / sha
    build_dir.mkdir(parents=True)
    (build_dir / "sizes.json").write_text(json.dumps({
        "sizes": {
            "tests_shell": {
                "native": {"bss": 1, "text": 2, "data": 3, "count": 0},
                "esp32": {"bss": 4, "text": 5, "data": 6, "count": 1},
            }
        }
    }))

    landing = tmp_path / "landing"
    out = land_build_stats(f"file://{ci}", sha, str(landing))
    assert out is not None and out.name == f"{sha}.json"
    doc = json.loads(out.read_text())
    assert doc["sha"] == sha and doc["ts"]  # Last-Modified captured

    n = incremental_refresh(
        spark, str(landing / "sizes"), str(tmp_path / "sink"),
        str(tmp_path / "ckpt"),
    )
    assert n == 2  # one row per (test, board)
    stored = spark.read.parquet(str(tmp_path / "sink"))
    rows = {(r["test"], r["board"]): r for r in stored.collect()}
    assert rows[("tests_shell", "esp32")]["dec"] == 15  # bss+text+data


def test_sizes_missing_build_returns_none(tmp_path):
    out = land_build_stats(f"file://{tmp_path}/ci", "nosuch", str(tmp_path / "l"))
    assert out is None


def test_cli_commits(tmp_path, riot_clone):
    rc = land_main(["commits", str(riot_clone), str(tmp_path / "landing")])
    assert rc == 0
    assert list((tmp_path / "landing" / "commits").glob("*.log"))
