"""CLI parity: `python -m warcsum_spark manifest|dedup|split|crawl` against
the pure-Python oracle on the seeded fixture archives."""

from __future__ import annotations

import glob
import os

from warcsum_spark.cli import main
from warcsum_spark.fixtures import gen_frontier_fixture, write_warc_archives
from warcsum_spark.oracle import (
    extended_lines,
    manifest_lines,
    oracle_extended,
    oracle_manifest,
    simulate_crawl,
)


def _archives(tmp_path):
    d = str(tmp_path / "archives")
    os.makedirs(d, exist_ok=True)
    write_warc_archives(d)
    return d


def test_cli_manifest_matches_oracle(spark, tmp_path, capsys):
    d = _archives(tmp_path)
    rc = main(["manifest", d, "-H", "sha1", "-o", "-"])
    assert rc == 0
    got = [l for l in capsys.readouterr().out.splitlines() if l]
    paths = sorted(glob.glob(os.path.join(d, "**", "*.warc.gz"), recursive=True))
    expect = manifest_lines(oracle_manifest(paths, algo="sha1", force=True))
    assert sorted(got) == sorted(expect)


def test_cli_dedup_and_split_roundtrip(spark, tmp_path, capsys):
    d = _archives(tmp_path)
    rc = main(["dedup", d, "-H", "sha1", "-o", "-", "-n", "3"])
    assert rc == 0
    got = [l for l in capsys.readouterr().out.splitlines() if l]
    paths = sorted(glob.glob(os.path.join(d, "**", "*.warc.gz"), recursive=True))
    expect = extended_lines(oracle_extended(oracle_manifest(paths, algo="sha1")))
    assert sorted(got) == sorted(expect)

    # manifest → dir, then split re-chunks without breaking clusters
    out = str(tmp_path / "manifest_out")
    assert main(["manifest", d, "-H", "sha1", "-o", out]) == 0
    assert main(["split", out, "-n", "2", "-o", "-"]) == 0
    split_lines = [l for l in capsys.readouterr().out.splitlines() if l]
    expect_m = manifest_lines(oracle_manifest(paths, algo="sha1"))
    assert sorted(split_lines) == sorted(expect_m)


def test_cli_crawl_matches_simulator(spark, tmp_path, capsys):
    seeds, link_graph, budgets, robots = gen_frontier_fixture()
    seeds_txt = tmp_path / "seeds.txt"
    seeds_txt.write_text("".join(f"{u} {p}\n" for u, p in seeds))
    lg_df = spark.createDataFrame(
        [(u, outs) for u, outs in sorted(link_graph.items())],
        "url string, outlinks array<string>",
    )
    lg_path = str(tmp_path / "lg.parquet")
    lg_df.write.parquet(lg_path)
    pol_df = spark.createDataFrame(sorted(budgets.items()), "host string, budget int")
    pol_path = str(tmp_path / "pol.parquet")
    pol_df.write.parquet(pol_path)
    rob_df = spark.createDataFrame(
        [
            (h, [{"allow": a, "prefix": p} for a, p in rules])
            for h, rules in sorted(robots.items())
        ],
        "host string, rules array<struct<allow boolean, prefix string>>",
    )
    rob_path = str(tmp_path / "rob.parquet")
    rob_df.write.parquet(rob_path)

    rc = main(
        [
            "crawl",
            "--seeds", str(seeds_txt),
            "--link-graph", lg_path,
            "--robots", rob_path,
            "--politeness", pol_path,
            "--rounds", "3",
            "--seen-filter", "cuckoo",
            "-o", "-",
        ]
    )
    assert rc == 0
    out_lines = [l for l in capsys.readouterr().out.splitlines() if l]
    got: dict[int, list[str]] = {}
    for line in out_lines:
        rnd, url = line.split(" ", 1)
        got.setdefault(int(rnd), []).append(url)
    sim = simulate_crawl(seeds, link_graph, budgets, robots, rounds=3)
    for rnd in range(3):
        assert got.get(rnd, []) == sim.scheduled_per_round[rnd], f"round {rnd}"
