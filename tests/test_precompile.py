"""Smoke coverage for the precompile warm-start entry point."""

from minbpe_tpu import precompile, RegexTokenizer


def test_precompile_buckets_and_tokenizer_form():
    done = precompile([5000], vocab_size=300)
    assert len(done) == 1 and done[0][0] >= 5000
    text = open("/root/reference/tests/taylorswift.txt",
                encoding="utf-8").read()[:20000]
    t = RegexTokenizer()
    t.train(text, 300)
    done2 = precompile([2000, 2100], tokenizer=t)
    assert len(done2) == 1  # same bucket -> warmed once
