"""Independent Python-reference tests for the round-5k wave:
SFT quality gate and the dedup-yield report.
"""

import hashlib

import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _synth_df():
    from ocr_engine_ray.pipelines.queries import transcript_paths

    return pd.concat([pq.read_table(p).to_pandas()
                      for p in transcript_paths(SF)],
                     ignore_index=True)


def test_sft_quality_gate_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_sft_quality_gate,
    )

    df = _synth_df().sort_values(["conv_id", "turn_idx", "ts"],
                                 kind="stable")
    fails = {"too_short": 0, "too_long": 0, "no_prompt": 0,
             "looping": 0}
    n_pairs = 0
    n_pass = 0
    for _, g in df.groupby("conv_id", sort=False):
        lines = [f"{r}: " + (t or "").replace("\x00", "")
                 for r, t in zip(g["role"], g["text"])]
        roles = list(g["role"])
        texts = [(t or "").replace("\x00", "") for t in g["text"]]
        for i, r in enumerate(roles):
            if r != "assistant":
                continue
            n_pairs += 1
            prompt = "\n".join(lines[max(0, i - 3):i])
            toks = texts[i].split(" ")
            cnt = {}
            mx = 0
            for j in range(len(toks) - 2):
                k = " ".join(toks[j:j + 3])
                cnt[k] = cnt.get(k, 0) + 1
                mx = max(mx, cnt[k])
            f = {"too_short": len(toks) < 8,
                 "too_long": len(toks) > 2048,
                 "no_prompt": prompt == "",
                 "looping": mx >= 3}
            for k, v in f.items():
                fails[k] += 1 if v else 0
            n_pass += 0 if any(f.values()) else 1

    rows = {r["reason"]: r for r in
            q_transcripts_sft_quality_gate(SF).take_all()}
    assert set(rows) == set(fails) | {"pass"}
    for k, v in fails.items():
        assert rows[k]["n_pairs"] == n_pairs
        assert rows[k]["n_flagged"] == v
    assert rows["pass"]["n_flagged"] == n_pass
    # the gate must actually reject something and pass something
    assert 0 < n_pass < n_pairs


def test_dedup_yield_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_dedup_yield,
    )

    df = _synth_df().sort_values(
        ["conv_id", "turn_idx", "role", "text"], kind="stable")
    convs = {}
    for cid, g in df.groupby("conv_id", sort=False):
        texts = [(t or "").replace("\x00", "") for t in g["text"]]
        render = "\n".join(f"{r}: {t}"
                           for r, t in zip(g["role"], texts))
        digest = hashlib.md5(
            render.replace("\x00", "").encode()).hexdigest()
        pairs = sum(1 for r in g["role"] if r == "assistant")
        tok = sum(len(t.split(" "))
                  for r, t in zip(g["role"], texts)
                  if r == "assistant")
        convs[cid] = (digest, pairs, tok)
    winners = {}
    for cid, (d, p, t) in convs.items():
        if d not in winners or cid < winners[d]:
            winners[d] = cid

    row = q_transcripts_dedup_yield(SF).take_all()[0]
    assert row["n_convs"] == len(convs)
    assert row["n_convs_kept"] == len(winners)
    assert row["n_pairs"] == sum(p for _, p, _ in convs.values())
    assert row["n_pairs_kept"] == sum(
        convs[w][1] for w in winners.values())
    assert row["resp_tokens"] == sum(t for _, _, t in convs.values())
    assert row["resp_tokens_kept"] == sum(
        convs[w][2] for w in winners.values())
