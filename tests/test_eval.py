import json

from rsvldm_tpu.eval import (split_list, get_chunk, ChunkedEvalRunner,
                             rouge_l, tfidf_cosine, evaluate_captions)


def test_split_and_chunk():
    lst = list(range(10))
    chunks = split_list(lst, 3)
    assert sum(len(c) for c in chunks) == 10
    assert get_chunk(lst, 3, 0) == [0, 1, 2, 3]
    assert get_chunk(lst, 3, 2) == [8, 9]
    assert get_chunk(lst, 20, 15) == []


def test_runner_appends_jsonl(tmp_path):
    out = tmp_path / "answers.jsonl"
    r = ChunkedEvalRunner(list(range(4)), num_chunks=2, chunk_idx=0)
    res = r.run(lambda i: {"q": i, "a": i * 2}, out)
    assert len(res) == 2
    lines = [json.loads(l) for l in out.read_text().splitlines()]
    assert lines[0]["a"] == 0


def test_runner_error_resilience(tmp_path):
    out = tmp_path / "a.jsonl"
    r = ChunkedEvalRunner([1, 2, 3])

    def fn(i):
        if i == 2:
            raise ValueError("boom")
        return {"ok": i}

    res = r.run(fn, out)
    assert len(res) == 3
    assert "error" in res[1]


def test_rouge_l():
    assert rouge_l("the cat sat", "the cat sat") == 1.0
    assert rouge_l("a b c", "x y z") == 0.0
    partial = rouge_l("the cat sat on the mat", "the cat is on a mat")
    assert 0.0 < partial < 1.0


def test_tfidf_cosine():
    assert tfidf_cosine("same words here", "same words here") > 0.999
    assert tfidf_cosine("alpha beta", "gamma delta") == 0.0


def test_evaluate_captions():
    out = evaluate_captions([("a river and fields", "fields near a river"),
                             ("urban area", "urban area with roads")])
    assert out["n"] == 2
    assert 0 < out["rouge_l"] <= 1
    assert 0 < out["tfidf_cosine"] <= 1
