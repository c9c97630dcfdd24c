"""Round-over-round bench trend reader (VERDICT r13 ask #6 mechanized).

Reads every committed BENCH_r*.json (and BENCH_pipeline_r*.json) and
prints, per headline query and per extended family, the latest reading
against the best prior probe-comparable reading — with both probes
beside every number so regime is never argued from memory. The r13
adjudication protocol in README ("identical digest + elevated probe +
moved total = host noise") becomes a table instead of a per-round
hand-comparison.

Flags a family when its latest reading exceeds FLAG_RATIO (1.5) x its
best prior reading — the VERDICT r13 ask #6 threshold — and exits 1 so
the check can gate a close checklist.

Probe-comparability rule (VERDICT r14 ask #4, mirroring the digest
rule): a >ratio row is only a FLAG when BOTH sides of the comparison
are probe-sane (every probe the artifact carries, pre and post, under
PROBE_SC_MAX / PROBE_MC_MAX). A row whose latest or best-prior reading
came from a degraded host still PRINTS, with the probes beside it and
a "regime-noise" annotation, but does not flip the exit code — r14's
driver artifact (mc 1.565-1.675) produced nine such rows, all of which
dissolved under matched-regime re-measurement; an alarm that cries
wolf on regime noise trains everyone to ignore it. Artifacts from the
pre-probe era carry no probes and stay flag-eligible (nothing to
adjudicate with — and they are all quiet-era readings).

Usage: python tools/bench_trend.py [--flag-ratio R]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLAG_RATIO = 1.5
# a reading is probe-sane when every probe its artifact carries is under
# these (quiet host: sc 0.80-0.94, mc/sc ~1.0-1.2; see SCALE.md r14)
PROBE_SC_MAX = 1.25
PROBE_MC_MAX = 1.2


def _probe_sane(*dicts: dict) -> bool:
    """True unless ANY probe field in the given dicts exceeds its
    threshold. Dicts with no probe fields at all are sane by default
    (pre-probe-era artifacts: nothing to adjudicate with)."""
    for d in dicts:
        for k, v in d.items():
            if not isinstance(v, (int, float)) or not k.startswith("probe_"):
                continue
            if v < 0:  # bench.py's "probe failed" sentinel (fork timeout)
                return False
            # prefix-matched so the _pre/_mid1/_mid2/_post variants all
            # adjudicate (bench_pipeline r16 adds mid-run pairs)
            if k.startswith("probe_mc_sec") and v > PROBE_MC_MAX:
                return False
            if k.startswith("probe_sec") and v > PROBE_SC_MAX:
                return False
    return True


def _probe_failed(*dicts: dict) -> bool:
    """True when any probe field carries the -1.0 fork-timeout sentinel.
    Kept distinct from contention-insanity so a host whose mc probe
    chronically times out prints as 'probe FAILED' instead of blending
    into the regime-noise annotation — a persistently failing probe
    silently fail-opens the regression gate and must stay visible."""
    return any(
        isinstance(v, (int, float)) and v < 0
        for d in dicts
        for k, v in d.items()
        if k.startswith("probe_")
    )


def _rounds(pattern: str) -> list[tuple[int, dict]]:
    out = []
    for f in sorted(glob.glob(os.path.join(REPO, pattern))):
        m = re.search(r"_r(\d+)\.json$", f)
        if not m:
            continue
        try:
            d = json.load(open(f))
        except Exception:
            continue
        # driver artifacts wrap the parsed line under "parsed"
        d = d.get("parsed", d)
        if isinstance(d, dict) and (
            "queries" in d or "extract_transform_total_s" in d
        ):
            out.append((int(m.group(1)), d))
    return out


def _probes(d: dict) -> str:
    sc = d.get("probe_sec")
    mc = d.get("probe_mc_sec")
    return f"probe {sc}" + (f"/mc {mc}" if mc is not None else "")


def _trend_block(rounds: list[tuple[int, dict]], which: str,
                 flag_ratio: float) -> list[str]:
    """which: 'queries' (headline) or 'extended'."""
    flagged: list[str] = []
    series: dict[str, list[tuple[int, float]]] = {}
    probes: dict[int, str] = {}
    # comparability rule (the README adjudication protocol, applied
    # mechanically): a prior reading is comparable ONLY if its round's
    # headline plan digest equals the latest round's — timings across
    # plan changes, or from the pre-digest era, say nothing about
    # regressions. This is why r13's VERDICT compared r13/r11, not
    # r13/r5.
    latest_round = max(r for r, _ in rounds)
    latest_digest = dict(rounds).get(latest_round, {}).get("plan_digest")
    comparable = {
        r for r, d in rounds
        if d.get("plan_digest") == latest_digest and latest_digest
    }
    sane: dict[int, bool] = {}
    failed: dict[int, bool] = {}
    # per-family digest witness (VERDICT r15 ask #5): artifacts from
    # r16+ embed each extended query's own registry digest
    # (extended.digests, from the suite-gated committed map), so a
    # family re-blessed between rounds is excluded from comparison
    # instead of inheriting stale priors under the headline-only rule.
    digests: dict[int, dict] = {}
    for r, d in rounds:
        if r not in comparable:
            continue
        block = d if which == "queries" else d.get("extended") or {}
        probes[r] = _probes(block if which == "extended" else d)
        # extended sanity also reads the top-level probes: the headline
        # post-probe immediately precedes the extended section, so it is
        # effectively that section's pre-probe
        sane[r] = _probe_sane(d, block)
        failed[r] = _probe_failed(d, block)
        # a dirty-tree artifact's embedded digests may not describe the
        # plans it measured (bench.py records the indicator, ADVICE r16
        # #3) — drop its per-family witness so its rows compare under
        # the headline rule only, loudly (warning printed below)
        if block.get("digests_dirty_tree"):
            digests[r] = {}
        else:
            digests[r] = block.get("digests") or {}
        for q, t in (block.get("queries") or {}).items():
            series.setdefault(q, []).append((r, t))
    if not series:
        return flagged
    print(f"\n[{which}] latest r{latest_round} ({probes[latest_round]}) "
          f"vs best prior:")
    if which == "extended":
        print("  note: digest comparability witnesses only the 18 headline"
              " plans; an extended family whose own registry digest changed"
              " between the compared rounds (tools/registry_digests.json"
              " history) may compare across a plan change")
        for r, d in rounds:
            err = (d.get("extended") or {}).get("digests_error")
            if err:
                print(f"  WARNING: r{r} artifact dropped its per-family "
                      f"digest witness ({err}) — its rows compare under "
                      f"the headline rule only")
            if (d.get("extended") or {}).get("digests_dirty_tree"):
                print(f"  WARNING: r{r} artifact was benched on a DIRTY "
                      f"working tree — its embedded per-family digests "
                      f"may not describe the measured plans; its rows "
                      f"compare under the headline rule only")
    latest_q_digests = digests.get(latest_round, {})
    for q in sorted(series):
        pts = series[q]
        cur = [t for r, t in pts if r == latest_round]
        prior = [(r, t) for r, t in pts if r != latest_round]
        # exclude priors whose OWN family digest differs from the
        # latest round's: both sides must carry a digest for q to
        # adjudicate; digest-less (pre-r16) priors stay comparable
        # under the headline rule, covered by the printed note
        cur_dig = latest_q_digests.get(q)
        if cur_dig:
            dropped = [
                r for r, _ in prior
                if digests.get(r, {}).get(q) not in (None, cur_dig)
            ]
            if dropped:
                print(f"  {q:38s} note: r{dropped} excluded — family "
                      f"digest changed since those readings")
                prior = [(r, t) for r, t in prior if r not in dropped]
        if not cur or not prior:
            status = "new" if cur else "absent-latest"
            print(f"  {q:38s} {status}")
            continue
        best_r, best_t = min(prior, key=lambda rt: rt[1])
        ratio = cur[0] / best_t if best_t else float("inf")
        mark = ""
        if ratio > flag_ratio:
            if sane.get(latest_round, True) and sane.get(best_r, True):
                mark = f"  <-- FLAG >{flag_ratio}x best (r{best_r} "
                mark += f"{probes[best_r]})"
                flagged.append(q)
            elif failed.get(latest_round) or failed.get(best_r):
                which_side = "latest" if failed.get(latest_round) else f"r{best_r}"
                mark = (f"  <-- >{flag_ratio}x best (r{best_r} "
                        f"{probes[best_r]}) but probe FAILED on {which_side} "
                        f"(fork-timeout sentinel): gate fail-open, "
                        f"investigate the probe, not flagged")
            else:
                mark = (f"  <-- >{flag_ratio}x best (r{best_r} "
                        f"{probes[best_r]}) but a probe-insane side: "
                        f"regime-noise, not flagged")
        print(f"  {q:38s} {cur[0]:7.3f}  best r{best_r} {best_t:7.3f}  "
              f"x{ratio:4.2f}{mark}")
    return flagged


def main() -> int:
    args = sys.argv[1:]
    flag_ratio = FLAG_RATIO
    if "--flag-ratio" in args:
        flag_ratio = float(args[args.index("--flag-ratio") + 1])

    rounds = _rounds("BENCH_r*.json")
    flagged = _trend_block(rounds, "queries", flag_ratio)
    flagged += _trend_block(rounds, "extended", flag_ratio)

    pipe = _rounds("BENCH_pipeline_r*.json")
    if pipe:
        print("\n[pipeline e2e]")
        for r, d in pipe:
            print(f"  r{r}: {d.get('extract_transform_total_s')} s = "
                  f"{d.get('vs_anchor')}x anchor ({_probes(d)}, "
                  f"digest {d.get('plan_digest')})")

    digests = {r: d.get("plan_digest") for r, d in rounds if d.get("plan_digest")}
    print(f"\nheadline plan digests: {digests}")
    if flagged:
        print(f"\nFLAGGED (latest > {flag_ratio}x best prior): {flagged}")
        return 1
    print("\nno family exceeds the flag ratio vs its best prior reading")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
