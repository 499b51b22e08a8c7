"""LLaVA training data pipeline: preprocessors, lazy dataset, collator,
length-grouped batching, and raw-JSON -> VLMTrainer.train_step end-to-end."""

import json

import numpy as np
import pytest

from rsvldm_tpu.training.vlm_data import (
    ChatMLSpecial, IGNORE_INDEX, IMAGE_TOKEN_INDEX, LazyConversationDataset,
    Llama3Special, collate, get_length_grouped_indices,
    get_modality_length_grouped_indices, iter_batches, preprocess,
    preprocess_chatml, preprocess_llama3, preprocess_plain, preprocess_v1,
    split_to_even_chunks)

# toy tokenizer: one id per word, stable; ids < 100
VOCAB: dict = {}


def encode(text):
    out = []
    for w in text.replace("\n", " \\n ").split():
        out.append(VOCAB.setdefault(w, len(VOCAB) + 5))
    return out


SRC = [
    {"from": "human", "value": "<image>\nwhat is this"},
    {"from": "gpt", "value": "a river delta"},
    {"from": "human", "value": "zoom in"},
    {"from": "gpt", "value": "sandbars visible"},
]


def test_llama3_masking():
    sp = Llama3Special(bos=101, start_header=102, end_header=103, eot=104,
                       nl=105)
    ids, labels = preprocess_llama3(SRC, encode, sp)
    assert ids[0] == sp.bos and labels[0] == sp.bos  # bos unmasked (:661)
    # image sentinel present in inputs, always IGNORE in labels
    assert (ids == IMAGE_TOKEN_INDEX).sum() == 1
    assert labels[ids == IMAGE_TOKEN_INDEX][0] == IGNORE_INDEX
    # structural tokens supervised everywhere
    for t in (sp.start_header, sp.end_header, sp.eot):
        assert np.all(labels[ids == t] == t)
    # assistant words supervised, user words masked
    a1 = encode("a river delta")
    for t in a1:
        assert t in labels
    q1 = [t for t in encode("what is this") if t not in a1]
    for t in q1:
        assert not np.any(labels[ids == t] == t)
    # roughly: supervised fraction strictly between 0 and 1
    sup = (labels != IGNORE_INDEX).mean()
    assert 0.2 < sup < 0.9


def test_llama3_skips_leading_assistant():
    sp = Llama3Special()
    ids_a, _ = preprocess_llama3(SRC, encode, sp)
    ids_b, _ = preprocess_llama3(
        [{"from": "gpt", "value": "stray"}] + SRC, encode, sp)
    np.testing.assert_array_equal(ids_a, ids_b)


def test_chatml_masking():
    sp = ChatMLSpecial(im_start=201, im_end=202, nl=203)
    ids, labels = preprocess_chatml(SRC, encode, sp)
    assert ids[0] == sp.im_start
    assert np.all(labels[ids == sp.im_start] == sp.im_start)
    assert labels[ids == IMAGE_TOKEN_INDEX][0] == IGNORE_INDEX
    for t in encode("sandbars visible"):
        assert t in labels


def test_v1_masking():
    ids, labels = preprocess_v1(SRC, encode, bos=1, sep2_id=2,
                                system="a chat")
    assert ids[0] == 1 and labels[0] == IGNORE_INDEX
    # the closing </s> of each answer supervises
    assert np.all(labels[ids == 2] == 2)
    for t in encode("a river delta"):
        assert t in labels


def test_v1_boundary_fix():
    """The default v1 path tokenizes whole rounds, so a merge-happy
    tokenizer produces the same ids as inference-time whole-string
    tokenization; boundary_compat reproduces the reference's chunked
    stream (train.py:777-786) which differs at the prompt|answer seam."""
    def pair_encode(text):
        # tokens = consecutive 2-char windows: concatenating separately
        # encoded chunks re-pairs differently than one-shot encoding
        s = text.replace("<image>", "@")
        return [ord(s[i]) * 256 + ord(s[i + 1]) if i + 1 < len(s)
                else ord(s[i]) for i in range(0, len(s), 2)]

    src = SRC[2:]  # one round, no image token (pure boundary test)
    q = "zoom in"
    a = "sandbars visible"
    whole = pair_encode(f"USER: {q} ASSISTANT: {a}")

    ids_fix, labels_fix = preprocess_v1(src, pair_encode, bos=1, sep2_id=2)
    assert list(ids_fix[1:-1]) == whole          # stream == inference-time
    assert ids_fix[-1] == 2 and labels_fix[-1] == 2

    ids_old, _ = preprocess_v1(src, pair_encode, bos=1, sep2_id=2,
                               boundary_compat=True)
    assert list(ids_old[1:-1]) != whole          # the reference's defect

    # supervised span still covers the answer and only the answer tail
    sup = labels_fix != IGNORE_INDEX
    assert sup.sum() >= len(pair_encode(a)) - 1


def test_plain_masking():
    ids, labels = preprocess_plain(SRC[:2], encode)
    assert ids[0] == IMAGE_TOKEN_INDEX and labels[0] == IGNORE_INDEX
    assert (labels != IGNORE_INDEX).sum() == len(ids) - 1


def test_preprocess_dispatch():
    for t in ("llama_3", "qwen", "v1"):
        ids, labels = preprocess(SRC, encode, t)
        assert len(ids) == len(labels)
    with pytest.raises(ValueError):
        preprocess(SRC, encode, "nope")


def _write_records(path, n, with_image=True, words=3):
    recs = []
    for i in range(n):
        rec = {"id": i, "conversations": [
            {"from": "human", "value": ("<image>\n" if with_image else "")
             + " ".join(["q"] * (i % 5 + 1))},
            {"from": "gpt", "value": " ".join(["a"] * words)}]}
        if with_image:
            rec["image"] = f"im{i}.png"
        recs.append(rec)
    path.write_text(json.dumps(recs))
    return recs


def test_lazy_dataset_json_and_lengths(tmp_path):
    _write_records(tmp_path / "d.json", 6)
    ds = LazyConversationDataset(tmp_path / "d.json", encode)
    assert len(ds) == 6
    assert all(l > 128 for l in ds.lengths)          # +128 image tokens
    assert all(l > 0 for l in ds.modality_lengths)   # all multimodal
    item = ds[2]
    assert item["input_ids"].dtype == np.int32
    assert (item["labels"] != IGNORE_INDEX).sum() > 0
    assert "image" not in item  # no process_image configured


def test_lazy_dataset_jsonl_and_yaml_sampling(tmp_path):
    recs = _write_records(tmp_path / "a.json", 10)
    with open(tmp_path / "b.jsonl", "w") as f:
        for r in recs[:4]:
            f.write(json.dumps(r) + "\n")
    (tmp_path / "m.yaml").write_text(
        f"datasets:\n"
        f"  - json_path: {tmp_path}/a.json\n"
        f"    sampling_strategy: first:3\n"
        f"  - json_path: {tmp_path}/b.jsonl\n"
        f"    sampling_strategy: random:50%\n")
    ds = LazyConversationDataset(tmp_path / "m.yaml", encode)
    assert len(ds) == 3 + 2


def test_lazy_dataset_brace_list(tmp_path):
    _write_records(tmp_path / "p1.json", 2)
    _write_records(tmp_path / "p2.json", 3)
    ds = LazyConversationDataset(str(tmp_path / "p{1,2}.json"), encode)
    assert len(ds) == 5


def test_collate_padding_and_buckets():
    inst = [{"input_ids": np.arange(5, dtype=np.int32),
             "labels": np.arange(5, dtype=np.int32)},
            {"input_ids": np.arange(9, dtype=np.int32),
             "labels": np.arange(9, dtype=np.int32)}]
    b = collate(inst, pad_id=0, pad_to_multiple=8)
    assert b["input_ids"].shape == (2, 16)  # 9 -> bucket 16
    assert b["labels"][0, 5] == IGNORE_INDEX
    assert b["attention_mask"].sum() == 14
    left = collate(inst, pad_id=0, pad_to_multiple=0, padding_side="left")
    assert left["input_ids"].shape == (2, 9)
    assert left["input_ids"][0, 0] == 0 and left["input_ids"][0, -1] == 4
    trunc = collate(inst, max_length=4, pad_to_multiple=0)
    assert trunc["input_ids"].shape == (2, 4)


def test_split_to_even_chunks():
    lengths = [10, 1, 9, 2, 8, 3]
    chunks = split_to_even_chunks(list(range(6)), lengths, 2)
    assert sorted(sum(chunks, [])) == list(range(6))
    assert all(len(c) == 3 for c in chunks)
    # uneven fallback: strided split
    chunks = split_to_even_chunks(list(range(5)), lengths, 2)
    assert chunks == [[0, 2, 4], [1, 3]]


def test_length_grouped_indices_partition():
    lengths = list(np.random.default_rng(0).integers(1, 50, 37))
    order = get_length_grouped_indices(lengths, batch_size=4, world_size=2,
                                       seed=1)
    assert sorted(order) == list(range(37))


def test_modality_grouped_indices():
    lengths = [5, -3, 8, -2, 7, -9, 4, -1, 6, 2]
    order = get_modality_length_grouped_indices(lengths, 2, 1, seed=0)
    assert sorted(order) == list(range(10))
    # all-one-modality falls back to plain length grouping
    order = get_modality_length_grouped_indices([3, 4, 5, 6], 2, 1)
    assert sorted(order) == [0, 1, 2, 3]


def test_end_to_end_json_to_train_step(tmp_path):
    """Raw conversation JSON -> dataset -> collated batch -> one
    VLMTrainer.train_step with correctly masked assistant tokens
    (round-2 review item #5 done-criterion)."""
    import jax
    import jax.numpy as jnp
    from rsvldm_tpu.models.vlm.llama import (KVCache, LlamaConfig,
                                             LlamaModel)
    from rsvldm_tpu.training.vlm_trainer import LoraConfig, VLMTrainer

    _write_records(tmp_path / "train.json", 5, with_image=False)
    sp = Llama3Special(bos=101, start_header=102, end_header=103, eot=104,
                       nl=105)  # toy vocab < 256
    ds = LazyConversationDataset(tmp_path / "train.json", encode,
                                 preprocess_kw={"sp": sp})
    batches = list(iter_batches(ds, batch_size=2, seed=0, pad_id=0,
                                pad_to_multiple=16,
                                group_by_modality_length=False))
    assert len(batches) == 2  # 5 samples -> two full batches of 2
    batch = batches[0]
    s = batch["input_ids"].shape[1]

    cfg = LlamaConfig(vocab_size=256, dim=32, layers=2, heads=4, kv_heads=2,
                      ffn_dim=64)
    model = LlamaModel(cfg)
    cache = KVCache.init(cfg, 2, s)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((2, 4), jnp.int32),
                        KVCache.init(cfg, 2, s), 0, method=model.from_tokens)
    trainer = VLMTrainer(model, params, LoraConfig(r=2, alpha=4), lr=1e-3)
    embeds = model.apply(params, jnp.asarray(batch["input_ids"]),
                         method=model.embed)
    loss = trainer.train_step(embeds, jnp.asarray(batch["labels"]), cache)
    assert np.isfinite(loss) and loss > 0


def test_normalize_multimodal_moves_image_to_front():
    from rsvldm_tpu.training.vlm_data import normalize_multimodal
    conv = [{"from": "human", "value": "What is shown here?\n<image>"},
            {"from": "gpt", "value": "a bridge"}]
    out = normalize_multimodal(conv)
    assert out[0]["value"] == "<image>\nWhat is shown here?"
    assert out[1]["value"] == "a bridge"
    # already-leading placeholder is a fixpoint
    assert normalize_multimodal(out)[0]["value"] == out[0]["value"]
    # multi-image: every placeholder moves, count preserved
    two = normalize_multimodal(
        [{"from": "human", "value": "a <image> b <image> c"}])
    assert two[0]["value"].count("<image>") == 2
    assert two[0]["value"].startswith("<image>\n<image>\n")


def test_preprocess_plain_bos():
    ids, labels = preprocess(
        [{"from": "human", "value": "<image>"},
         {"from": "gpt", "value": "caption words"}],
        encode, "plain", bos=777)
    assert ids[0] == 777 and labels[0] == IGNORE_INDEX
    assert ids[1] == IMAGE_TOKEN_INDEX


def test_preprocess_v1_trailing_human_turn_included_masked():
    paired = [{"from": "human", "value": "q one"},
              {"from": "gpt", "value": "a one"}]
    trailing = paired + [{"from": "human", "value": "q two"}]
    ids_p, _ = preprocess(paired, encode, "v1")
    ids_t, labels_t = preprocess(trailing, encode, "v1")
    assert len(ids_t) > len(ids_p)          # tail tokens ARE in the stream
    tail = labels_t[len(ids_p):]
    assert (tail == IGNORE_INDEX).all()     # ...and fully masked


def test_collate_mixed_modalities_and_width_cap():
    inst = [{"input_ids": np.arange(5), "labels": np.arange(5),
             "image": np.ones((2, 2, 3))},
            {"input_ids": np.arange(9), "labels": np.arange(9)}]
    b = collate(inst, pad_id=0, pad_to_multiple=8)
    assert b["images"][0] is not None and b["images"][1] is None
    # bucket rounding never pads past max_length
    c = collate(inst, pad_id=0, max_length=6, pad_to_multiple=8)
    assert c["input_ids"].shape[1] == 6


def test_modality_fallback_signed_lengths():
    from rsvldm_tpu.training.vlm_data import (
        get_length_grouped_indices, get_modality_length_grouped_indices)
    lengths = [-5, -9, -2, -7, -4, -1, -8, -3]
    ours = get_modality_length_grouped_indices(lengths, 2, 1, seed=3)
    ref = get_length_grouped_indices(lengths, 2, 1, seed=3)  # SIGNED passthru
    assert ours == ref


def test_dataset_multi_image_record(tmp_path):
    import json as _json
    recs = [{"id": "m", "image": ["a.png", "b.png"],
             "conversations": [
                 {"from": "human", "value": "<image> and <image>"},
                 {"from": "gpt", "value": "two views"}]}]
    p = tmp_path / "d.json"
    p.write_text(_json.dumps(recs))
    from rsvldm_tpu.training.vlm_data import LazyConversationDataset
    ds = LazyConversationDataset(str(p), encode, template="v1",
                                 process_image=lambda path: f"img:{path}")
    item = ds[0]
    assert item["image"] == ["img:a.png", "img:b.png"]
