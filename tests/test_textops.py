"""Unit tests for split_assign / normalize_text (SURVEY.md §2.11)."""

import hashlib

import ray.data

from tableextraction_ray.functions.textstats import normalize_text, split_assign


class TestSplitAssign:
    def test_matches_reference_hash_and_is_stable(self, ray_session):
        docs = ray.data.from_items([{"doc_id": i} for i in range(200)])
        rows = {r["doc_id"]: r for r in split_assign(docs).take_all()}
        for d in (0, 7, 42, 199):
            b = int(hashlib.md5(f"split:{d}".encode()).hexdigest()[:8], 16) % 100
            assert rows[d]["bucket"] == b
            want = "test" if b < 10 else ("val" if b < 20 else "train")
            assert rows[d]["split"] == want
        # roughly proportional split at n=200
        counts = {}
        for r in rows.values():
            counts[r["split"]] = counts.get(r["split"], 0) + 1
        assert counts["train"] > counts.get("val", 0)
        assert set(counts) <= {"train", "val", "test"}

    def test_salt_isolates_splits(self, ray_session):
        docs = ray.data.from_items([{"doc_id": i} for i in range(100)])
        a = {r["doc_id"]: r["bucket"] for r in split_assign(docs, salt="a").take_all()}
        b = {r["doc_id"]: r["bucket"] for r in split_assign(docs, salt="b").take_all()}
        assert a != b


class TestNormalizeText:
    def test_normalization_rules(self, ray_session):
        docs = ray.data.from_items(
            [
                {"doc_id": 1, "text": "  HeLLo,,  WORLD!!  Привет---МИР  x9 "},
                {"doc_id": 2, "text": "\t\n"},
                {"doc_id": 3, "text": "a.b,c"},
            ]
        )
        rows = {r["doc_id"]: r for r in normalize_text(docs).take_all()}
        assert rows[1]["norm_text"] == "hello world привет мир x9"
        assert rows[1]["n_norm_chars"] == len(rows[1]["norm_text"])
        assert rows[2]["norm_text"] == ""
        assert rows[3]["norm_text"] == "a b c"

    def test_reformatted_copies_collide(self, ray_session):
        docs = ray.data.from_items(
            [
                {"doc_id": 1, "text": "The  Quick Brown FOX!"},
                {"doc_id": 2, "text": "the quick... brown fox"},
            ]
        )
        rows = [r["norm_text"] for r in normalize_text(docs).take_all()]
        assert rows[0] == rows[1]


class TestRedactText:
    def test_patterns_and_order(self, ray_session):
        docs = ray.data.from_items(
            [
                {"doc_id": 1, "text": "see https://ex.com/a?b=1 or mail a.b+c@ex-mail.co now"},
                {"doc_id": 2, "text": "call 79161234567 or 123456 short"},
                {"doc_id": 3, "text": "clean text"},
                # URL containing an email-shaped substring: URL pass wins
                {"doc_id": 4, "text": "http://x.com/a@b.com tail"},
            ]
        )
        from tableextraction_ray.functions.textstats import redact_text

        rows = {r["doc_id"]: r for r in redact_text(docs).take_all()}
        assert rows[1]["redacted"] == "see <URL> or mail <EMAIL> now"
        assert rows[1]["n_redactions"] == 2
        assert rows[2]["redacted"] == "call <NUM> or 123456 short"  # 6 digits kept
        assert rows[2]["n_redactions"] == 1
        assert rows[3]["redacted"] == "clean text"
        assert rows[3]["n_redactions"] == 0
        assert rows[4]["redacted"] == "<URL> tail"


class TestTokenFreq:
    def test_topk_with_deterministic_ties(self, ray_session):
        docs = ray.data.from_items(
            [
                {"doc_id": 1, "text": "b b b a a c"},
                {"doc_id": 2, "text": "a d c"},
            ]
        )
        from tableextraction_ray.functions.textstats import token_freq

        rows = token_freq(docs, k=3).take_all()
        assert [(r["token"], r["n"]) for r in rows] == [("a", 3), ("b", 3), ("c", 2)]


class TestCurateCorpus:
    def test_keeps_reps_above_quality_gate(self, ray_session):
        from tableextraction_ray.functions.curate import curate_corpus

        docs = ray.data.from_items(
            [
                # exact copies: only min doc_id can survive
                {"doc_id": 1, "text": "good clean alphabetic text content here"},
                {"doc_id": 2, "text": "good clean alphabetic text content here"},
                # all-digit junk: fails the alpha gate
                {"doc_id": 3, "text": "1234567 890123 456789 000111"},
                # distinct good doc
                {"doc_id": 4, "text": "another perfectly fine document body"},
            ]
        )
        rows = {r["doc_id"]: r for r in curate_corpus(docs).take_all()}
        assert set(rows) == {1, 4}
        assert all(r["split"] in ("train", "val", "test") for r in rows.values())


class TestStratifiedSample:
    def test_k_per_group_deterministic(self, ray_session):
        from tableextraction_ray.functions.textstats import stratified_sample

        docs = ray.data.from_items(
            [{"doc_id": i, "source": f"s{i % 3}"} for i in range(60)]
        )
        a = sorted(
            (r["source"], r["rk"], r["doc_id"])
            for r in stratified_sample(docs, k=4).take_all()
        )
        b = sorted(
            (r["source"], r["rk"], r["doc_id"])
            for r in stratified_sample(docs.repartition(7), k=4).take_all()
        )
        assert a == b  # partition-invariant
        per_src = {}
        for src, rk, _ in a:
            per_src.setdefault(src, []).append(rk)
        assert all(sorted(v) == [1, 2, 3, 4] for v in per_src.values())
        assert set(per_src) == {"s0", "s1", "s2"}


class TestRepetitionStats:
    def test_hand_computed(self, ray_session):
        import ray

        from tableextraction_ray.functions.textstats import repetition_stats

        # "a b a b a b": 11 chars, bigram "a b" x3 (len 3 -> 9 chars),
        # trigrams "a b a" x2 + "b a b" x2 (len 5 -> 20 chars, overlaps
        # counted per occurrence so the fraction exceeds 1).
        out = repetition_stats(
            ray.data.from_items(
                [
                    {"doc_id": 1, "text": "a b a b a b"},
                    {"doc_id": 2, "text": "all distinct words here"},
                    {"doc_id": 3, "text": ""},
                ]
            )
        ).take_all()
        r = {x["doc_id"]: x for x in out}
        assert r[1]["n_tokens"] == 6
        assert r[1]["top_bigram_char_fp6"] == 818182  # floor(9/11*1e6+0.5)
        assert r[1]["dup_trigram_char_fp6"] == 1818182  # floor(20/11*1e6+0.5)
        assert r[2]["dup_trigram_char_fp6"] == 0
        assert r[2]["top_bigram_char_fp6"] > 0  # some bigram still covers chars
        assert r[3] == {
            "doc_id": 3, "n_tokens": 0,
            "top_bigram_char_fp6": 0, "dup_trigram_char_fp6": 0,
        }


class TestCharBudgetPrefix:
    def test_matches_manual_prefix_sum_across_blocks(self, ray_session):
        import ray

        from tableextraction_ray.functions.textstats import char_budget_prefix

        # shuffled input across several blocks; n_chars varies
        items = [
            {"doc_id": d, "n_chars": (d * 37) % 101 + 1} for d in range(100)
        ]
        import random

        rng = random.Random(7)
        rng.shuffle(items)
        ds = ray.data.from_items(items, override_num_blocks=8)
        budget = 2000
        out = sorted(
            char_budget_prefix(ds, budget=budget).take_all(),
            key=lambda r: r["doc_id"],
        )
        run, expect = 0, []
        for d in range(100):
            nc = (d * 37) % 101 + 1
            run += nc
            if run <= budget:
                expect.append({"doc_id": d, "n_chars": nc, "cum_chars": run})
        assert out == expect
        assert 0 < len(out) < 100  # budget actually cuts mid-corpus

    def test_budget_covers_all(self, ray_session):
        import ray

        from tableextraction_ray.functions.textstats import char_budget_prefix

        ds = ray.data.from_items(
            [{"doc_id": d, "n_chars": 10} for d in range(20)],
            override_num_blocks=4,
        )
        out = char_budget_prefix(ds, budget=10_000).take_all()
        assert len(out) == 20
        assert max(r["cum_chars"] for r in out) == 200


class TestEpochShuffle:
    def test_rank_is_dense_permutation_matching_hash_order(self, ray_session):
        import hashlib

        import ray

        from tableextraction_ray.functions.textstats import epoch_shuffle

        ids = list(range(200))
        ds = ray.data.from_items(
            [{"doc_id": d} for d in ids], override_num_blocks=7
        )
        out = epoch_shuffle(ds, epoch=0).take_all()
        assert sorted(r["rank"] for r in out) == list(range(1, 201))
        key = lambda d: (
            int(hashlib.md5(f"epoch0:{d}".encode()).hexdigest()[:15], 16), d
        )
        expect = {d: i + 1 for i, d in enumerate(sorted(ids, key=key))}
        assert {r["doc_id"]: r["rank"] for r in out} == expect

    def test_epochs_differ(self, ray_session):
        import ray

        from tableextraction_ray.functions.textstats import epoch_shuffle

        ds = ray.data.from_items([{"doc_id": d} for d in range(50)])
        e0 = {r["doc_id"]: r["rank"] for r in epoch_shuffle(ds, 0).take_all()}
        e1 = {r["doc_id"]: r["rank"] for r in epoch_shuffle(ds, 1).take_all()}
        assert e0 != e1


class TestPackSequences:
    def test_next_fit_semantics(self, ray_session):
        import ray

        from tableextraction_ray.functions.textstats import pack_sequences

        # one shard (ids 0..5, shard_size 64): capacity 100
        # 40+40 fit seq0; 30 doesn't (80+30>100) -> seq1; 120 oversize
        # alone -> seq2; 50+50 -> seq3
        docs = [
            {"doc_id": 0, "n_chars": 40},
            {"doc_id": 1, "n_chars": 40},
            {"doc_id": 2, "n_chars": 30},
            {"doc_id": 3, "n_chars": 120},
            {"doc_id": 4, "n_chars": 50},
            {"doc_id": 5, "n_chars": 50},
        ]
        out = sorted(
            pack_sequences(
                ray.data.from_items(docs), capacity=100
            ).take_all(),
            key=lambda r: r["doc_id"],
        )
        assert [(r["seq_no"], r["offset_chars"]) for r in out] == [
            (0, 0), (0, 40), (1, 0), (2, 0), (3, 0), (3, 50),
        ]

    def test_shards_pack_independently(self, ray_session):
        import ray

        from tableextraction_ray.functions.textstats import pack_sequences

        # ids 0 and 64 land in different shards -> both start at seq 0
        docs = [{"doc_id": 0, "n_chars": 10}, {"doc_id": 64, "n_chars": 10}]
        out = {
            r["doc_id"]: (r["shard"], r["seq_no"], r["offset_chars"])
            for r in pack_sequences(ray.data.from_items(docs)).take_all()
        }
        assert out == {0: (0, 0, 0), 64: (1, 0, 0)}


class TestSourceQualityReport:
    def test_exact_sums_and_extremes(self, ray_session):
        import ray

        from tableextraction_ray.functions.textstats import (
            quality_score,
            source_quality_report,
        )

        docs = [
            {"doc_id": 0, "source": "web", "text": "abc def"},
            {"doc_id": 1, "source": "web", "text": "a1 b2 c3"},
            {"doc_id": 2, "source": "book", "text": "pure words only"},
        ]
        ds = ray.data.from_items(docs)
        alpha = {
            r["doc_id"]: r["alpha_fp6"] for r in quality_score(ds).take_all()
        }
        out = {r["source"]: r for r in source_quality_report(ds).take_all()}
        assert out["web"]["n_docs"] == 2
        assert out["web"]["sum_chars"] == 15
        assert out["web"]["sum_alpha_fp6"] == alpha[0] + alpha[1]
        assert out["web"]["min_alpha_fp6"] == min(alpha[0], alpha[1])
        assert out["web"]["max_alpha_fp6"] == max(alpha[0], alpha[1])
        assert out["book"]["n_docs"] == 1 and out["book"]["sum_alpha_fp6"] == alpha[2]


class TestRareBigramRate:
    def test_hand_computed(self, ray_session):
        from tableextraction_ray.functions.textstats import rare_bigram_rate

        # bigrams: d0: "a b","b c" ; d1: "a b","b d" ; d2: "x y" ; d3: ""
        # global counts: "a b":2, "b c":1, "b d":1, "x y":1
        docs = ray.data.from_items(
            [
                {"doc_id": 0, "text": "a b c"},
                {"doc_id": 1, "text": "a b d"},
                {"doc_id": 2, "text": "x y"},
                {"doc_id": 3, "text": "solo"},
            ]
        )
        out = {r["doc_id"]: r for r in rare_bigram_rate(docs).take_all()}
        assert len(out) == 4
        assert out[0]["n_bigrams"] == 2 and out[0]["n_rare"] == 1
        assert out[0]["rare_fp6"] == 500000
        assert out[1]["n_bigrams"] == 2 and out[1]["n_rare"] == 1
        assert out[2]["n_bigrams"] == 1 and out[2]["n_rare"] == 1
        assert out[2]["rare_fp6"] == 1000000
        assert out[3]["n_bigrams"] == 0 and out[3]["n_rare"] == 0
        assert out[3]["rare_fp6"] == 0

    def test_in_doc_repeat_is_not_rare(self, ray_session):
        from tableextraction_ray.functions.textstats import rare_bigram_rate

        # "p q" occurs twice inside ONE doc -> global count 2 -> not rare
        docs = ray.data.from_items([{"doc_id": 7, "text": "p q p q"}])
        (r,) = rare_bigram_rate(docs).take_all()
        # bigrams: "p q","q p","p q" -> n=3; "q p" is the only singleton
        assert r["n_bigrams"] == 3 and r["n_rare"] == 1

    def test_partition_invariance(self, ray_session):
        from tableextraction_ray.functions.textstats import rare_bigram_rate

        docs = ray.data.from_items(
            [{"doc_id": i, "text": f"w{i % 17} common w{i % 5} tail{i}"} for i in range(120)]
        )
        a = sorted(rare_bigram_rate(docs).take_all(), key=lambda r: r["doc_id"])
        b = sorted(
            rare_bigram_rate(docs.repartition(11)).take_all(),
            key=lambda r: r["doc_id"],
        )
        assert a == b


class TestQualityPercentile:
    def test_hand_computed_with_single_doc_source(self, ray_session):
        from tableextraction_ray.functions.textstats import quality_percentile

        # alpha ratios: d0 "aaaa"=1.0, d1 "aa11"=0.5, d2 "1111"=0.0 (src A)
        # d3 solo source B -> pct 0
        docs = ray.data.from_items(
            [
                {"doc_id": 0, "text": "aaaa", "source": "A"},
                {"doc_id": 1, "text": "aa11", "source": "A"},
                {"doc_id": 2, "text": "1111", "source": "A"},
                {"doc_id": 3, "text": "zz", "source": "B"},
            ]
        )
        out = {r["doc_id"]: r for r in quality_percentile(docs).take_all()}
        assert out[2]["pct_fp6"] == 0
        assert out[1]["pct_fp6"] == 500000
        assert out[0]["pct_fp6"] == 1000000
        assert out[3]["pct_fp6"] == 0

    def test_tie_break_and_block_invariance(self, ray_session):
        from tableextraction_ray.functions.textstats import quality_percentile

        # many identical alpha values -> ranks decided by doc_id
        docs = [
            {"doc_id": i, "text": "abc" if i % 3 else "ab1", "source": f"s{i % 4}"}
            for i in range(120)
        ]
        a = sorted(
            quality_percentile(ray.data.from_items(docs)).take_all(),
            key=lambda r: r["doc_id"],
        )
        b = sorted(
            quality_percentile(ray.data.from_items(docs).repartition(17)).take_all(),
            key=lambda r: r["doc_id"],
        )
        assert a == b
        # within a source, equal alpha -> pct strictly increasing by doc_id
        by_src: dict[str, list] = {}
        for r in a:
            by_src.setdefault(r["source"], []).append(r)
        for rows in by_src.values():
            rows.sort(key=lambda r: (r["alpha_fp6"], r["doc_id"]))
            pcts = [r["pct_fp6"] for r in rows]
            assert pcts == sorted(pcts) and len(set(pcts)) == len(pcts)


class TestCurateSemantic:
    def test_conjunction_of_components(self, ray_session):
        import ray.data

        from tableextraction_ray.functions.curate import curate_semantic
        from tableextraction_ray.functions.dedup import dedup_clusters
        from tableextraction_ray.functions.similarity import semantic_dedup
        from tableextraction_ray.functions.textstats import quality_score

        sf = "/root/testdata/sf0.001"
        docs = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        emb = ray.data.read_parquet(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
        out = {r["doc_id"]: r for r in curate_semantic(docs, emb).take_all()}
        keeps = {r["vec_id"]: r for r in semantic_dedup(emb).take_all()}
        reps = {r["doc_id"]: r["cluster_rep"] for r in dedup_clusters(docs).take_all()}
        alphas = {r["doc_id"]: r["alpha_fp6"] for r in quality_score(docs).take_all()}
        expected = {
            d for d in reps
            if keeps[d]["keep"] and reps[d] == d and alphas[d] >= 500000
        }
        assert set(out) == expected and len(expected) > 0
        for d, r in out.items():
            assert r["cid"] == keeps[d]["cid"] and r["alpha_fp6"] == alphas[d]

class TestSourceCap:
    def test_keeps_top_by_quality(self, ray_session):
        from tableextraction_ray.functions.textstats import source_cap

        # source "a": 5 docs with distinct alpha ratios; cap=2 keeps best 2
        docs = [
            {"doc_id": 0, "text": "11111", "source": "a"},   # alpha 0
            {"doc_id": 1, "text": "a1111", "source": "a"},   # alpha .2
            {"doc_id": 2, "text": "aa111", "source": "a"},   # alpha .4
            {"doc_id": 3, "text": "aaa11", "source": "a"},   # alpha .6
            {"doc_id": 4, "text": "aaaa1", "source": "a"},   # alpha .8
            {"doc_id": 5, "text": "zzzzz", "source": "b"},   # alpha 1
        ]
        out = sorted(
            source_cap(ray.data.from_items(docs), cap=2).take_all(),
            key=lambda r: (r["source"], r["top_rank"]),
        )
        assert [(r["doc_id"], r["source"], r["top_rank"]) for r in out] == [
            (4, "a", 1),
            (3, "a", 2),
            (5, "b", 1),
        ]

    def test_tie_break_and_partition_invariance(self, ray_session):
        from tableextraction_ray.functions.textstats import source_cap

        # all-equal alpha -> top_rank decided by doc_id DESC
        docs = [
            {"doc_id": i, "text": "abc", "source": f"s{i % 3}"} for i in range(30)
        ]
        a = sorted(
            source_cap(ray.data.from_items(docs), cap=3).take_all(),
            key=lambda r: r["doc_id"],
        )
        b = sorted(
            source_cap(
                ray.data.from_items(docs).repartition(11), cap=3
            ).take_all(),
            key=lambda r: r["doc_id"],
        )
        assert a == b
        # equal alpha: the 3 highest doc_ids per source survive
        expected = {29, 28, 27, 26, 25, 24, 23, 22, 21}
        assert {r["doc_id"] for r in a} == expected
        for r in a:
            assert 1 <= r["top_rank"] <= 3

class TestTfidfTopTerms:
    def test_hand_computed(self, ray_session):
        import math

        from tableextraction_ray.functions.textstats import tfidf_top_terms

        # 4 docs; "rare" appears in 1 doc (pruned by min_df=2),
        # "cat" in 2, "the" in all 4 (idf 0).
        docs = [
            {"doc_id": 0, "text": "the cat cat sat"},
            {"doc_id": 1, "text": "the cat ran"},
            {"doc_id": 2, "text": "the dog ran rare"},
            {"doc_id": 3, "text": "the dog"},
        ]
        out = sorted(
            tfidf_top_terms(ray.data.from_items(docs), k=2).take_all(),
            key=lambda r: (r["doc_id"], r["rnk"]),
        )
        idf = lambda df: math.floor(math.log(4 / df) * 1e6 + 0.5)
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r)
        # doc 0: cat tf=2 (df 2), sat pruned (df 1), the score 0
        assert [(r["term"], r["tf"], r["score_fp6"]) for r in by_doc[0]] == [
            ("cat", 2, 2 * idf(2)),
            ("the", 1, 0),
        ]
        # doc 2: dog and ran tie on score (both df=2, tf=1) -> term ASC
        assert [(r["term"], r["rnk"]) for r in by_doc[2]] == [
            ("dog", 1),
            ("ran", 2),
        ]
        # "rare" (df=1) never appears anywhere
        assert all(r["term"] != "rare" for r in out)

    def test_partition_invariance_and_case(self, ray_session):
        from tableextraction_ray.functions.textstats import tfidf_top_terms

        docs = [
            {"doc_id": i, "text": f"Alpha BETA gamma{i % 5} alpha beta"}
            for i in range(40)
        ]
        a = sorted(
            tfidf_top_terms(ray.data.from_items(docs)).take_all(),
            key=lambda r: (r["doc_id"], r["rnk"]),
        )
        b = sorted(
            tfidf_top_terms(ray.data.from_items(docs).repartition(13)).take_all(),
            key=lambda r: (r["doc_id"], r["rnk"]),
        )
        assert a == b and len(a) > 0
        # Alpha/alpha fold to one term with tf=2
        r0 = [r for r in a if r["doc_id"] == 0 and r["term"] == "alpha"]
        assert r0 and r0[0]["tf"] == 2

class TestChunkDocuments:
    def test_windows_and_stop_rule(self, ray_session):
        from tableextraction_ray.functions.textstats import chunk_documents

        toks = " ".join(str(i) for i in range(10))  # 10 tokens
        docs = [
            {"doc_id": 0, "text": toks},
            {"doc_id": 1, "text": "only three tokens"},
            {"doc_id": 2, "text": ""},
            {"doc_id": 3, "text": " ".join(str(i) for i in range(4))},  # n == C
        ]
        out = sorted(
            chunk_documents(
                ray.data.from_items(docs), chunk_tokens=4, stride=3
            ).take_all(),
            key=lambda r: (r["doc_id"], r["chunk_id"]),
        )
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r)
        # doc 0: starts 0,3,6 cover to 10; start 9 is skipped (6+4 >= 10)
        assert [(r["start_tok"], r["n_tok"], r["chunk_text"]) for r in by_doc[0]] == [
            (0, 4, "0 1 2 3"),
            (3, 4, "3 4 5 6"),
            (6, 4, "6 7 8 9"),
        ]
        # doc 1: single short window
        assert [(r["start_tok"], r["n_tok"]) for r in by_doc[1]] == [(0, 3)]
        # empty doc -> no chunks
        assert 2 not in by_doc
        # n == chunk size -> exactly one window (start 3 covered by start 0)
        assert [(r["start_tok"], r["n_tok"]) for r in by_doc[3]] == [(0, 4)]

    def test_partition_invariance(self, ray_session):
        from tableextraction_ray.functions.textstats import chunk_documents

        docs = [
            {"doc_id": i, "text": " ".join(f"w{i}_{j}" for j in range(i % 7 * 30))}
            for i in range(25)
        ]
        a = sorted(
            chunk_documents(ray.data.from_items(docs)).take_all(),
            key=lambda r: (r["doc_id"], r["chunk_id"]),
        )
        b = sorted(
            chunk_documents(ray.data.from_items(docs).repartition(9)).take_all(),
            key=lambda r: (r["doc_id"], r["chunk_id"]),
        )
        assert a == b and len(a) > 0


class TestTokenizeIds:
    DOCS = [
        {"doc_id": 0, "text": "a b a c"},
        {"doc_id": 1, "text": "a rare1 b"},
        {"doc_id": 2, "text": ""},
    ]

    def test_hand_computed_with_unk(self, ray_session):
        from tableextraction_ray.functions.textstats import tokenize_ids

        out = sorted(
            (r["doc_id"], r["pos"], r["tid"])
            for r in tokenize_ids(
                ray.data.from_items(self.DOCS), vocab_size=2
            ).take_all()
        )
        # counts: a=3, b=2, c=1, rare1=1 -> vocab {a:1, b:2}; c/rare1 -> UNK 0
        assert out == [
            (0, 0, 1), (0, 1, 2), (0, 2, 1), (0, 3, 0),
            (1, 0, 1), (1, 1, 0), (1, 2, 2),
        ]

    def test_vocab_tie_break_and_partition_invariance(self, ray_session):
        from tableextraction_ray.functions.textstats import tokenize_ids

        docs = [{"doc_id": i, "text": "z y z y x"} for i in range(6)]
        a = sorted(
            (r["doc_id"], r["pos"], r["tid"])
            for r in tokenize_ids(
                ray.data.from_items(docs).repartition(1), vocab_size=2
            ).take_all()
        )
        b = sorted(
            (r["doc_id"], r["pos"], r["tid"])
            for r in tokenize_ids(
                ray.data.from_items(docs).repartition(6), vocab_size=2
            ).take_all()
        )
        assert a == b
        # z and y tie on count: token ASC rank gives y=1, z=2; x -> UNK
        assert a[0][2] == 2 and a[1][2] == 1 and a[4][2] == 0


class TestPackTokenBlocks:
    DOCS = [
        {"doc_id": 0, "text": "a b a c"},
        {"doc_id": 1, "text": "a rare1 b"},
        {"doc_id": 2, "text": ""},
        {"doc_id": 3, "text": "b a"},
    ]

    def _rows(self, ds, **kw):
        from tableextraction_ray.functions.textstats import pack_token_blocks

        return sorted(
            (r["example_id"], r["pos"], r["tid"], r["doc_id"])
            for r in pack_token_blocks(ds, **kw).take_all()
        )

    def test_hand_computed_with_tail_drop(self, ray_session):
        # token stream in doc_id order (vocab a=1, b=2, UNK=0):
        #   doc0: 1 2 1 0 | doc1: 1 0 2 | doc3: 2 1   -> 9 tokens
        # seq_len=4: examples 0,1 full; the 1-token tail (ex 2) drops.
        out = self._rows(
            ray.data.from_items(self.DOCS), seq_len=4, vocab_size=2
        )
        assert out == [
            (0, 0, 1, 0), (0, 1, 2, 0), (0, 2, 1, 0), (0, 3, 0, 0),
            (1, 0, 1, 1), (1, 1, 0, 1), (1, 2, 2, 1), (1, 3, 2, 3),
        ]

    def test_keep_remainder(self, ray_session):
        out = self._rows(
            ray.data.from_items(self.DOCS),
            seq_len=4,
            vocab_size=2,
            drop_remainder=False,
        )
        assert len(out) == 9
        assert out[-1] == (2, 0, 1, 3)

    def test_partition_invariance(self, ray_session):
        docs = [
            {"doc_id": i, "text": f"tok{i % 3} x y z w"[: 5 + i % 7]}
            for i in range(23)
        ]
        a = self._rows(ray.data.from_items(docs).repartition(1), seq_len=8)
        b = self._rows(ray.data.from_items(docs).repartition(9), seq_len=8)
        assert a == b and len(a) > 0

    def test_matches_tokenize_ids_stream(self, ray_session):
        """pack_token_blocks(drop_remainder=False) is exactly the tokenize_ids stream
        re-indexed by the global (doc_id, pos) order."""
        from tableextraction_ray.functions.textstats import tokenize_ids

        ds = ray.data.from_items(self.DOCS)
        ref = [
            r["tid"]
            for r in sorted(
                tokenize_ids(ds, vocab_size=2).take_all(),
                key=lambda r: (r["doc_id"], r["pos"]),
            )
        ]
        packed = self._rows(ds, seq_len=4, vocab_size=2, drop_remainder=False)
        got = [t for (_, _, t, _) in sorted(packed)]
        assert got == ref


class TestWinnowing:
    def _local(self, text, k=5, w=4):
        import numpy as np

        from tableextraction_ray.functions.dedup import shingle_base_hash
        from tableextraction_ray.functions.textstats import ascii_tokens

        toks = ascii_tokens(text)
        n = len(toks) - k + 1
        if n <= 0:
            return set()
        hashes = [shingle_base_hash(" ".join(toks[i : i + k])) for i in range(n)]
        picked = set()
        for s in range(max(n - w + 1, 1)):
            win = hashes[s : s + w]
            m = min(win)
            pos = s + max(i for i, h in enumerate(win) if h == m)
            picked.add((pos, m))
        return picked

    def test_matches_reference_definition(self, ray_session):
        from tableextraction_ray.functions.dedup import winnow_fingerprints

        docs = [
            {"doc_id": 0, "text": "a b c d e f g h i j k l"},
            {"doc_id": 1, "text": "one two three four five six"},  # n=2
            {"doc_id": 2, "text": "w x y z zz"},  # n=1 (single gram)
            {"doc_id": 3, "text": "too short"},  # no gram
        ]
        out = {}
        for r in winnow_fingerprints(ray.data.from_items(docs)).take_all():
            out.setdefault(r["doc_id"], set()).add((r["pos"], r["fph"]))
        for d in docs:
            assert out.get(d["doc_id"], set()) == self._local(d["text"])

    def test_shared_substring_guarantee(self, ray_session):
        """The winnowing guarantee: any match of >= w+k-1 tokens between
        two documents shares at least one selected fingerprint."""
        from tableextraction_ray.functions.dedup import winnow_fingerprints

        shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 = w+k-1
        docs = [
            {"doc_id": 0, "text": "x1 x2 x3 " + shared + " x4 x5"},
            {"doc_id": 1, "text": "y1 " + shared + " y2 y3 y4 y5 y6"},
        ]
        fps = {}
        for r in winnow_fingerprints(ray.data.from_items(docs)).take_all():
            fps.setdefault(r["doc_id"], set()).add(r["fph"])
        assert fps[0] & fps[1]

    def test_partition_invariance(self, ray_session):
        from tableextraction_ray.functions.dedup import winnow_fingerprints

        docs = [
            {"doc_id": i, "text": " ".join(f"t{(i * 7 + j) % 13}" for j in range(30))}
            for i in range(20)
        ]
        a = sorted(
            (r["doc_id"], r["pos"], r["fph"])
            for r in winnow_fingerprints(ray.data.from_items(docs).repartition(1)).take_all()
        )
        b = sorted(
            (r["doc_id"], r["pos"], r["fph"])
            for r in winnow_fingerprints(ray.data.from_items(docs).repartition(8)).take_all()
        )
        assert a == b

    def test_overlap_pairs_and_boilerplate_guard(self, ray_session):
        from tableextraction_ray.functions.dedup import winnow_overlap

        shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        docs = [
            {"doc_id": 0, "text": "x1 x2 " + shared},
            {"doc_id": 1, "text": "y1 " + shared + " y2"},
            {"doc_id": 2, "text": "totally different words here of course q r s t u v"},
        ]
        pairs = {
            (r["doc_a"], r["doc_b"]): r["n_shared"]
            for r in winnow_overlap(ray.data.from_items(docs)).take_all()
        }
        assert set(pairs) == {(0, 1)} and pairs[(0, 1)] >= 2
        # boilerplate guard: a fingerprint shared by everyone is dropped
        many = [
            {"doc_id": i, "text": shared} for i in range(10)
        ]
        capped = winnow_overlap(
            ray.data.from_items(many), max_bucket=4
        ).take_all()
        assert capped == []


class TestStripHtml:
    HTML_DOCS = [
        "<html><head><style>body{x}</style><script>var a=1;</script></head>"
        "<body><h1>Title</h1><p>Hello &amp; <b>world</b>!</p>"
        "<div>Second&nbsp;line</div><ul><li>a</li><li>b</li></ul></body></html>",
        "plain text no markup",
        "<p>Multi\nline <br>break</p>  trailing   spaces  ",
        "<SCRIPT>upper case</SCRIPT>visible<STYLE a=b>css</STYLE>",
        "ampersand chain &amp;lt; stays &lt;tag&gt;",
        "",
    ]

    def test_real_html_behavior(self, ray_session):
        from tableextraction_ray.functions.textstats import strip_html

        docs = [
            {"doc_id": i, "text": t} for i, t in enumerate(self.HTML_DOCS)
        ]
        out = {
            r["doc_id"]: r["clean_text"]
            for r in strip_html(ray.data.from_items(docs)).take_all()
        }
        assert out[0] == "Title\nHello & world !\nSecond line\na\nb"
        assert out[1] == "plain text no markup"
        assert out[3] == "visible"
        assert out[4] == "&lt; stays <tag>" or "&lt;" in out[4]
        assert out[5] == ""

    def test_python_duckdb_parity_on_real_html(self, ray_session):
        """The oracle runs against plain-text documents (identity); this
        pins the REAL-HTML behavior of the SQL chain to the Python
        contract on markup-heavy inputs."""
        import duckdb

        import __ray_entry__ as entry_mod
        from tableextraction_ray.functions.textstats import strip_html_text

        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents AS SELECT * FROM (VALUES "
            + ",".join(f"({i}, ?)" for i in range(len(self.HTML_DOCS)))
            + ") t(doc_id, text)",
            list(self.HTML_DOCS),
        )
        rows = con.sql(entry_mod.oracle_sql()["strip_html"]).fetchall()
        for doc_id, clean, n in sorted(rows):
            assert clean == strip_html_text(self.HTML_DOCS[doc_id])
            assert n == len(clean)


class TestGopherFilter:
    def _one(self, text, **kw):
        from tableextraction_ray.functions.textstats import gopher_filter

        out = gopher_filter(
            ray.data.from_items([{"doc_id": 0, "text": text}]), **kw
        ).take_all()
        assert len(out) == 1
        return out[0]

    def test_good_doc_passes(self, ray_session):
        text = " ".join(
            ["the quick brown fox jumps over lazy dogs that have fun with it"]
            * 5
        )
        r = self._one(text, min_words=10)
        assert r["passes"] == 1
        assert all(r[k] == 1 for k in (
            "r_words", "r_mean", "r_symbol", "r_bullet", "r_ellipsis",
            "r_alpha", "r_stop"))

    def test_rule_bits(self, ray_session):
        # 4 words, mean len (3+3+3+3)/4=3 OK, 1 '#' => 10*1 > 4 fails
        # symbol; only 1 stopword 'the' => r_stop fails; words < 50.
        r = self._one("the abc de# fgh")
        assert (r["r_words"], r["r_symbol"], r["r_stop"]) == (0, 0, 0)
        assert r["r_mean"] == 1 and r["passes"] == 0

    def test_bullet_and_ellipsis_lines(self, ray_session):
        # 10 lines: 10 bullets -> 10*10 > 9*10 fails bullet; none end
        # with '...' -> ellipsis ok.
        text = "\n".join("- item %d" % i for i in range(10))
        r = self._one(text)
        assert r["r_bullet"] == 0 and r["r_ellipsis"] == 1
        # 1 of 3 lines ends with '...' -> 10 > 9 fails (> 0.3)
        r2 = self._one("one line\nanother goes on...\nthird")
        assert r2["r_ellipsis"] == 0

    def test_empty_doc(self, ray_session):
        r = self._one("")
        assert r["n_words"] == 0 and r["r_mean"] == 0 and r["passes"] == 0

    def test_symbol_runs_non_overlapping(self, ray_session):
        # '.....' counts as ONE '...' run (str.count semantics); 5 words,
        # 1 run -> 10 > 5 fails; with 10+ words it passes.
        r = self._one("word one two three four .....")
        assert r["r_symbol"] == 0
        r2 = self._one("w1 w2 w3 w4 w5 w6 w7 w8 w9 wA .....")
        assert r2["r_symbol"] == 1


class TestCharEntropy:
    def _run(self, texts):
        from tableextraction_ray.functions.textstats import char_entropy

        ds = ray.data.from_items(
            [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
        )
        return {r["doc_id"]: r for r in char_entropy(ds).take_all()}

    def test_hand_computed(self, ray_session):
        import math

        got = self._run(["aab"])[0]
        S = 2 * math.floor(math.log(3 / 2) * 1e9) + 1 * math.floor(
            math.log(3 / 1) * 1e9
        )
        assert got["n_chars_t"] == 3 and got["n_distinct"] == 2
        assert got["ent_fp9"] == S // 3

    def test_ordering_and_edges(self, ray_session):
        got = self._run(["", "aaaa", "abcd", "aabb"])
        assert got[0]["ent_fp9"] == 0 and got[0]["n_distinct"] == 0
        # constant string has zero entropy
        assert got[1]["ent_fp9"] == 0 and got[1]["n_distinct"] == 1
        # uniform 4 distinct > 2x2 distinct > constant
        assert got[2]["ent_fp9"] > got[3]["ent_fp9"] > got[1]["ent_fp9"]
        # uniform over 4 symbols = ln(4) nats (floor-quantized)
        import math

        assert abs(got[2]["ent_fp9"] - math.log(4) * 1e9) < 4


class TestExtractMainContent:
    def _one(self, html, **kw):
        from tableextraction_ray.functions.textstats import extract_main_content

        out = extract_main_content(
            ray.data.from_items([{"doc_id": 0, "text": html}]), **kw
        ).take_all()
        return out[0]

    def test_link_density_classification(self, ray_session):
        html = (
            '<div id="nav"><a href="/">Home</a> <a href="/x">Products</a></div>'
            "<p>This is the long main article paragraph with enough prose "
            "to clear the minimum content length bar easily.</p>"
            '<p>Short stub.</p>'
            "<p>A second real paragraph that cites <a href=\"/ref\">one "
            "reference link</a> but is mostly readable prose text.</p>"
            '<div class="footer"><a href="/tos">Terms</a><a href="/p">Privacy</a></div>'
        )
        r = self._one(html)
        assert r["n_blocks"] == 5 and r["n_kept"] == 2
        lines = r["main_text"].split("\n")
        assert lines[0].startswith("This is the long main article")
        assert lines[1].startswith("A second real paragraph")
        assert "Terms" not in r["main_text"] and "Home" not in r["main_text"]

    def test_script_and_style_removed(self, ray_session):
        html = (
            "<script>var x = 'this script body is long enough to pass';</script>"
            "<style>body { color: red; font-size: 12px; margin: 0 }</style>"
            "<p>Actual visible content paragraph long enough to keep here.</p>"
        )
        r = self._one(html)
        assert r["n_kept"] == 1 and "script body" not in r["main_text"]
        assert "color" not in r["main_text"]

    def test_plain_text_is_one_block(self, ray_session):
        r = self._one("just a plain sentence with no markup at all in it")
        assert (r["n_blocks"], r["n_kept"]) == (1, 1)
        assert r["main_text"] == "just a plain sentence with no markup at all in it"

    def test_all_anchor_page(self, ray_session):
        html = '<p><a href="/a">aaaaaaaaaaaaaaa</a> <a href="/b">bbbbbbbbbbbbbbbb</a></p>'
        r = self._one(html)
        assert r["n_blocks"] == 1 and r["n_kept"] == 0 and r["main_text"] == ""


class TestExtractMainContentParity:
    RAW_DOCS = [
        "<p>nested <a href='/x'>link <b>with bold</b> inside</a> and "
        "surrounding prose words that keep this block content-heavy.</p>",
        "A plain prose paragraph that is long enough to stay as content.",
        "<ul><li><a href='/1'>one</a></li><li><a href='/2'>two</a></li></ul>",
        "<h1>Heading</h1><p>Body text under the heading, long enough to "
        "stay after the heuristic applies its length rule.</p>",
        "<SCRIPT>var hidden = 'nope';</SCRIPT>shown text that is long "
        "enough to survive the content-length gate here",
        "",
    ]

    def test_python_duckdb_parity_on_markup(self, ray_session):
        """The corpus oracle wraps docs in the nav/footer skeleton; this
        pins the SQL chain to the Python contract on adversarial markup
        (nested anchors, link lists, uppercase script, empty doc)."""
        import duckdb

        import __ray_entry__ as entry_mod
        from tableextraction_ray.functions.textstats import (
            extract_main_content_text,
        )

        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents AS SELECT * FROM (VALUES "
            + ",".join(f"({i}, ?)" for i in range(len(self.RAW_DOCS)))
            + ") t(doc_id, text)",
            list(self.RAW_DOCS),
        )
        rows = con.sql(
            entry_mod.oracle_sql()["extract_main_content"]
        ).fetchall()
        assert len(rows) == len(self.RAW_DOCS)
        for doc_id, n_blocks, n_kept, main_text in sorted(rows):
            wrapped = (
                '<div class="nav"><a href="/">Home</a> '
                '<a href="/about">About us</a></div><p>'
                + self.RAW_DOCS[doc_id]
                + '</p><div class="footer"><a href="/tos">Terms of Service</a> '
                '<a href="/priv">Privacy</a></div>'
            )
            nb, nk, mt = extract_main_content_text(wrapped)
            assert (n_blocks, n_kept, main_text) == (nb, nk, mt), doc_id


class TestPmiCollocations:
    def test_hand_computed(self, ray_session):
        import math

        from tableextraction_ray.functions.textstats import pmi_collocations

        # "new york" always adjacent; "the cat"/"the dog" dilute "the".
        docs = ray.data.from_items(
            [
                {"doc_id": 0, "text": "new york new york new york"},
                {"doc_id": 1, "text": "the cat the dog the cat"},
            ]
        )
        out = {
            (r["tok_a"], r["tok_b"]): r
            for r in pmi_collocations(
                docs, k=10, min_count=2
            ).take_all()
        }
        # bigram table: (new,york)x3 (york,new)x2 (the,cat)x2 (cat,the)x1
        # (the,dog)x1 (dog,the)x1 -> N=10
        r = out[("new", "york")]
        assert r["n_ab"] == 3
        # n_a(new)=3, n_b(york)=3 -> PMI = ln(3*10/9)
        assert r["pmi_fp9"] == math.floor(math.log(float(30) / float(9)) * 1e9)
        # (the,cat): n_ab=2, n_a(the)=3, n_b(cat)=2 -> ln(20/6) -- present
        assert out[("the", "cat")]["n_ab"] == 2

    def test_min_count_prunes_but_marginals_are_full(self, ray_session):
        import math

        from tableextraction_ray.functions.textstats import pmi_collocations

        docs = ray.data.from_items(
            [{"doc_id": 0, "text": "a b a b a c"}]
        )
        # bigrams: (a,b)x2 (b,a)x2 (a,c)x1 -> N=5
        out = {
            (r["tok_a"], r["tok_b"]): r
            for r in pmi_collocations(docs, k=10, min_count=2).take_all()
        }
        assert set(out) == {("a", "b"), ("b", "a")}  # (a,c) pruned
        # marginals still count (a,c): n_a(a)=3 not 2
        r = out[("a", "b")]
        assert r["pmi_fp9"] == math.floor(
            math.log(float(2 * 5) / float(3 * 2)) * 1e9
        )

    def test_partition_invariance(self, ray_session):
        from tableextraction_ray.functions.textstats import pmi_collocations

        docs = [
            {"doc_id": i, "text": f"alpha beta w{i % 5} gamma delta"}
            for i in range(40)
        ]
        a = pmi_collocations(
            ray.data.from_items(docs).repartition(1), k=20, min_count=2
        ).take_all()
        b = pmi_collocations(
            ray.data.from_items(docs).repartition(9), k=20, min_count=2
        ).take_all()
        key = lambda r: (r["pmi_fp9"], r["tok_a"], r["tok_b"])
        assert sorted(map(key, a)) == sorted(map(key, b)) and len(a) > 0


class TestWeightedSample:
    def _run(self, rows, **kw):
        from tableextraction_ray.functions.textstats import weighted_sample

        return weighted_sample(ray.data.from_items(rows), **kw).take_all()

    def test_deterministic_and_partition_invariant(self, ray_session):
        from tableextraction_ray.functions.textstats import weighted_sample

        rows = [{"doc_id": i, "n_chars": 10 + (i * 17) % 90} for i in range(200)]
        key = lambda r: (r["rk"], r["doc_id"], r["key_fp9"])
        a = sorted(map(key, self._run(rows, k=20)))
        b = sorted(
            map(
                key,
                weighted_sample(
                    ray.data.from_items(rows).repartition(9), k=20
                ).take_all(),
            )
        )
        assert a == b and len(a) == 20

    def test_weight_proportional_selection(self, ray_session):
        # one heavy doc among many light ones: the heavy doc should be
        # sampled with probability ~ w_heavy / sum(w). With weight 1000x,
        # it lands in a k=50-of-500 sample essentially always.
        rows = [{"doc_id": i, "n_chars": 1} for i in range(499)]
        rows.append({"doc_id": 999, "n_chars": 100000})
        out = {r["doc_id"] for r in self._run(rows, k=50)}
        assert 999 in out

    def test_zero_weight_excluded_and_ranks_dense(self, ray_session):
        rows = [
            {"doc_id": 1, "n_chars": 0},
            {"doc_id": 2, "n_chars": 5},
            {"doc_id": 3, "n_chars": 7},
        ]
        out = sorted(self._run(rows, k=10), key=lambda r: r["rk"])
        assert [r["rk"] for r in out] == [1, 2]
        assert {r["doc_id"] for r in out} == {2, 3}


class TestSourceTopTokens:
    def test_per_source_ranking_and_ties(self, ray_session):
        from tableextraction_ray.functions.textstats import source_top_tokens

        docs = ray.data.from_items(
            [
                {"source": "a", "text": "x x y z z"},
                {"source": "a", "text": "x"},
                {"source": "b", "text": "q q q w"},
            ]
        )
        out = sorted(
            (r["source"], r["rk"], r["token"], r["n"])
            for r in source_top_tokens(docs, k=2).take_all()
        )
        # source a: x=3 then z=2 (beats y=1); tie z? no -> deterministic
        assert out == [
            ("a", 1, "x", 3), ("a", 2, "z", 2),
            ("b", 1, "q", 3), ("b", 2, "w", 1),
        ]

    def test_partition_invariance(self, ray_session):
        from tableextraction_ray.functions.textstats import source_top_tokens

        docs = [
            {"source": f"s{i % 4}", "text": f"t{i % 7} t{i % 5} common"}
            for i in range(80)
        ]
        key = lambda r: (r["source"], r["rk"], r["token"], r["n"])
        a = sorted(map(key, source_top_tokens(
            ray.data.from_items(docs).repartition(1), k=3).take_all()))
        b = sorted(map(key, source_top_tokens(
            ray.data.from_items(docs).repartition(9), k=3).take_all()))
        assert a == b and len(a) == 12


class TestSourceVocabOverlap:
    def test_hand_computed_overlap(self, ray_session):
        from tableextraction_ray.functions.textstats import source_vocab_overlap

        docs = ray.data.from_items(
            [
                {"source": "a", "text": "x y z"},
                {"source": "b", "text": "x y q"},
                {"source": "c", "text": "p q r"},
            ]
        )
        out = {
            (r["source_a"], r["source_b"]): r
            for r in source_vocab_overlap(docs, vocab_size=8).take_all()
        }
        ab = out[("a", "b")]
        assert (ab["n_common"], ab["n_union"]) == (2, 4)  # {x,y} of {x,y,z,q}
        assert ab["jaccard_fp6"] == 500000
        ac = out[("a", "c")]
        assert ac["n_common"] == 0 and ac["jaccard_fp6"] == 0
        bc = out[("b", "c")]
        assert bc["n_common"] == 1  # q

    def test_vocab_cap_applies(self, ray_session):
        from tableextraction_ray.functions.textstats import source_vocab_overlap

        # shared rare token falls OUTSIDE each source's top-1 vocab
        docs = ray.data.from_items(
            [
                {"source": "a", "text": "aa aa rare"},
                {"source": "b", "text": "bb bb rare"},
            ]
        )
        out = source_vocab_overlap(docs, vocab_size=1).take_all()
        assert len(out) == 1 and out[0]["n_common"] == 0


class TestTypoTokenPairs:
    def test_substitution_insertion_and_verify(self, ray_session):
        import ray.data

        from tableextraction_ray.functions.textstats import typo_token_pairs

        docs = ray.data.from_items(
            [
                {"doc_id": 1, "text": "cat cut dog dig dogg"},
                {"doc_id": 2, "text": "cat cat cut hello hallo"},
                # 'abcd'/'cdab' share no single-deletion variant; also
                # 'ab'/'ba' (transposition = distance 2) must NOT pair
                {"doc_id": 3, "text": "abcd cdab ab ba"},
            ]
        ).repartition(2)
        rows = sorted(
            (r["token_a"], r["token_b"], r["n_a"], r["n_b"])
            for r in typo_token_pairs(docs, vocab_k=20).take_all()
        )
        assert rows == [
            ("cat", "cut", 3, 2),
            ("dig", "dog", 1, 1),
            ("dog", "dogg", 1, 1),
            ("hallo", "hello", 1, 1),
        ]

    def test_vocab_cap_excludes_tail(self, ray_session):
        import ray.data

        from tableextraction_ray.functions.textstats import typo_token_pairs

        # 'dog'/'dig' are rank 3/4 by (n desc, token) -> vocab_k=2 keeps
        # only 'cat' (x3) and 'cut' (x2); the dog/dig pair must vanish
        docs = ray.data.from_items(
            [{"doc_id": 1, "text": "cat cat cat cut cut dog dig"}]
        )
        rows = [
            (r["token_a"], r["token_b"])
            for r in typo_token_pairs(docs, vocab_k=2).take_all()
        ]
        assert rows == [("cat", "cut")]


class TestQualityBlendRank:
    def test_borda_blend_matches_local_replay(self, ray_session):
        """Top-20 blend must equal a pandas replay composing the two
        signal operators' own outputs."""
        import pandas as pd

        from tableextraction_ray.functions.selection import lm_perplexity
        from tableextraction_ray.functions.textstats import (
            quality_blend_rank, quality_score,
        )

        docs = ray.data.read_parquet(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id", "text", "source"],
        )
        q = quality_score(docs).to_pandas()[["doc_id", "alpha_fp6"]]
        l = lm_perplexity(docs).to_pandas()[["doc_id", "mean_nll_fp9"]]
        q = q.sort_values(
            ["alpha_fp6", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        q["r_quality"] = range(len(q))
        l = l.sort_values(["mean_nll_fp9", "doc_id"]).reset_index(drop=True)
        l["r_fluency"] = range(len(l))
        b = q.merge(l, on="doc_id")
        b["blend"] = b["r_quality"] + b["r_fluency"]
        want = (
            b.sort_values(["blend", "doc_id"]).head(20)[
                ["doc_id", "r_quality", "r_fluency", "blend"]
            ].reset_index(drop=True)
        )
        got = quality_blend_rank(docs).to_pandas()[
            ["doc_id", "r_quality", "r_fluency", "blend"]
        ]
        pd.testing.assert_frame_equal(
            got.astype("int64"), want.astype("int64")
        )
