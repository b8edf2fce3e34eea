#!/usr/bin/env python3
"""Per-family wall-time sums over two bench recordings (the SCALING.md
Results table). Usage: family_sums.py <sf0.1.json> <sf1.json>"""
import json, sys

FAMILIES = {
    "doc dedup, scale paths": [
        "dedup_exact", "dedup_minhash", "dedup_inc",
        "dedup_inc_apply", "dedup_apply", "dedup_apply_best",
        "dedup_simhash", "dedup_banded"],
    "dedup, raw yardsticks": ["dedup_ngram"],
    "substring / boilerplate / classifier": [
        "substr_spans", "substr_inc",
        "substr_apply", "text_bp", "text_bp_apply",
        "text_bp_lines", "clf",
        "clf_weighted", "clf_trained",
        "clf_stored", "clf_eval"],
    "embedding near-dup (LSH)": [
        "embed_lsh", "embed_inc",
        "embed_inc_apply"],
    "SemDeDup": ["semdedup_pairs", "semdedup_prune"],
    "ANN / similarity top-k": [
        "topk", "topk_ivf", "topk_kmeans",
        "topk_indexed", "topk_requant", "topk_ivf2", "topk_sq",
        "topk_ivf_sq", "topk_indexed_sq", "topk_idx2", "topk2_sq",
        "topk_pq", "topk_ivf_pq", "topk_idx_pq", "topk2_pq",
        "topk_rpq"],
    "ANN delete / retire / serving compositions": [
        "topk_del", "topk2_del", "topk_sq_del", "topk2_sq_del",
        "topk_sq_ids", "topk2_sq_ids", "topk_pq_del", "topk_pq_ids",
        "topk2_pq_del", "topk2_pq_ids",
        "curate_retire", "curate_ret2", "hybrid_rrf"],
    "text analysis": [
        "text_lang_id", "text_quality", "text_tokens",
        "text_modes", "text_df", "text_hll",
        "text_fingerprint", "text_commonness", "text_repetition",
        "text_pii_scrub", "text_lm_score",
        "bm25", "bm25_stored",
        "text_lm_stored"],
    "curation": [
        "decontaminate", "sample_strat", "split_assign", "source_cap",
        "mix_weighted", "pack_sequences", "qbudget",
        "qbudget_lang", "snapshot_diff", "pipeline_curate",
        "curate_inc", "dsir_weights", "dsir_resample"],
    "multimodal": [
        "mm_decode", "mm_resize", "mm_frames",
        "mm_byte_stats", "mm_audio_meta", "mm_pixels", "mm_png_pixels",
        "mm_jpeg_pixels", "mm_audio_pcm", "mm_pcm16", "mm_video"],
    "export": ["export_shards", "export_manifest"],
    "relational / TPC-H-ish": [
        "q1_agg", "q3_revenue", "q5_revenue",
        "top3_per_user", "skew_salted_join"],
    "EVM logs / lookups": [
        "logs_range", "logs_addr", "logs_topics",
        "logs_blockhash", "logs_cursor", "logs_offset",
        "logs_json", "logs_tarray", "block_by_hash", "block_by_number",
        "tx_by_hash", "tx_value_decimal", "latest_at",
        "evm_stats"],
    "ingest / events / streaming twins": [
        "ingest_explode", "ingest_idem", "reorg_rollback",
        "events_hourly", "events_sessions", "stream_twin",
        "stream_sink", "stream_retire"],
}


def main(p01, p1):
    a = json.load(open(p01))["queries"]
    b = json.load(open(p1))["queries"]
    assigned = [q for qs in FAMILIES.values() for q in qs]
    assert len(assigned) == len(set(assigned)), "duplicate assignment"
    for name, qs in (("sf0.1", a), ("sf1", b)):
        missing = set(qs) - set(assigned)
        assert not missing, f"unassigned queries in {name}: {missing}"
        gone = set(assigned) - set(qs)
        assert not gone, f"assigned but not in {name} recording (stale file?): {gone}"
        bad = {q: v for q, v in qs.items() if v < 0}
        assert not bad, f"{name} carries failure sentinels (-1) — rerecord: {bad}"
    print("| family | queries | sf0.1 s | sf1 s | ratio |")
    print("|---|---|---|---|---|")
    for fam, qs in FAMILIES.items():
        sa = sum(a[q] for q in qs)
        sb = sum(b[q] for q in qs)
        print(f"| {fam} | {len(qs)} | {sa:.1f} | {sb:.1f} | {sb/sa:.1f}x |")
    ta, tb = sum(a.values()), sum(b.values())
    print(f"totals: sf0.1 {ta:.1f} s, sf1 {tb:.1f} s, ratio {tb/ta:.1f}x")
    worst = sorted(((b[q]/a[q] if a[q] > 0.05 else 0, q) for q in a), reverse=True)
    print("worst ratios:", [(q, round(r, 1)) for r, q in worst[:8]])
    print("heaviest sf1:", sorted(b.items(), key=lambda kv: -kv[1])[:8])


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
