"""GPT-4 machinery at scale, hermetically (VERDICT round-1 item 7).

cl100k_base cannot be fetched offline (the reference fails identically), so
these tests drive the full GPT4 pipeline — merge-forest recovery
(reference minbpe/gpt4.py:11-46), byte shuffle (gpt4.py:76-92), sorted
pair-table device encode, decode un-shuffle, specials — on a deterministic
synthetic ranks table big enough to exercise the large-vocab paths
(vocab > DENSE_VOCAB_MAX forces the bucketed chunk encoder + sorted table,
the same route real cl100k takes).
"""

import random

import pytest

import oracle
from minbpe_tpu.gpt4 import GPT4Tokenizer, recover_merge_forest
from minbpe_tpu.utils.synthranks import synthetic_ranks

# both sizes route past engine.DENSE_VOCAB_MAX (same encode route as real
# cl100k); 100,256 is the true cl100k_base rank count (minbpe/gpt4.py:63),
# slow-marked — the default gate runs the 8K instance of every test here.
N_RANKS_PARAMS = [8192, pytest.param(100_256, marks=pytest.mark.slow)]


@pytest.fixture(scope="module", params=N_RANKS_PARAMS,
                ids=lambda n: f"ranks{n}")
def synth(request):
    ranks, intended, specials = synthetic_ranks(request.param, seed=7)
    return ranks, intended, specials


@pytest.fixture(scope="module")
def tok(synth):
    ranks, _, specials = synth
    return GPT4Tokenizer.from_mergeable_ranks(ranks, specials)


def test_recovery_exact_at_scale(synth):
    ranks, intended, _ = synth
    assert recover_merge_forest(ranks) == intended


def test_routes_through_sorted_table(tok):
    from minbpe_tpu.engine import device_table

    assert device_table(tok).kind == "sorted"


def _oracle_encode(tok, ranks, intended, text):
    """tiktoken-style oracle: GPT-4 pre-split, byte shuffle, greedy
    lowest-rank merge per chunk (reference minbpe/gpt4.py:81-85)."""
    perm = {b: ranks[bytes([b])] for b in range(256)}
    # rank == new id for tiktoken tables; rank order is merge priority
    rank_table = {pair: (r, r) for pair, r in intended.items()}
    out = []
    for chunk in tok._split_chunks(text):
        out.extend(oracle.encode([perm[b] for b in chunk], rank_table))
    return out


@pytest.mark.parametrize("seed", range(3))
def test_encode_matches_oracle_and_round_trips(tok, synth, seed):
    ranks, intended, _ = synth
    rng = random.Random(900 + seed)
    text = (
        "".join(chr(rng.randint(33, 1000)) for _ in range(rng.randint(200, 800)))
        + " hello't world 123  \n\n  tail'll"
    )
    ids = tok.encode(text)
    assert ids == _oracle_encode(tok, ranks, intended, text)
    assert tok.decode(ids) == text


def test_special_tokens_at_scale(tok, synth):
    # NOTE: reference GPT4Tokenizer.decode (minbpe/gpt4.py:87-92) does not
    # handle special ids, so only the encode side is checked here (mirrors
    # the reference test, tests/test_tokenizer.py:72-77).
    _, _, specials = synth
    name, sid = next(iter(specials.items()))
    ids = tok.encode(f"hello {name} world", allowed_special="all")
    at = ids.index(sid)
    assert ids[:at] == tok.encode("hello ")
    assert ids[at + 1:] == tok.encode(" world")


def test_full_corpus_round_trip(tok):
    text = open("/root/reference/tests/taylorswift.txt", encoding="utf-8").read()
    sample = text[:50000]
    assert tok.decode(tok.encode(sample)) == sample
