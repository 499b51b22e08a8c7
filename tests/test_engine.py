"""Continuous-batching decode engine (serving/engine.py) + LLM worker.

The engine must produce, for every request, exactly the tokens the plain
`generate` path produces for that prompt alone (greedy) — regardless of
slot placement, co-tenants, staggered admission, or slot reuse. That is
the correctness contract of continuous batching: scheduling must be
invisible in the output.
"""

import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsvldm_tpu.models.vlm.generate import GenerateConfig, generate
from rsvldm_tpu.models.vlm.llama import KVCache, LlamaConfig, LlamaModel
from rsvldm_tpu.serving.engine import DecodeEngine

CFG = LlamaConfig(vocab_size=128, dim=32, layers=2, heads=4, kv_heads=2,
                  ffn_dim=64, dtype=jnp.float32)


@pytest.fixture(scope="module")
def model_and_params():
    model = LlamaModel(CFG)
    cache = KVCache.init(CFG, 1, 8, jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 4), jnp.int32), cache, 0,
                        method=model.from_tokens)
    return model, params


def _prompts(model, params, lengths, seed=7):
    rng = np.random.default_rng(seed)
    out = []
    for s in lengths:
        ids = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(s,)),
                          jnp.int32)
        out.append(model.apply(params, ids, method=model.embed))
    return out


def _ref(model, params, prompts, cfg):
    return [generate(model, params, p, cfg, jax.random.PRNGKey(1))
            for p in prompts]


GREEDY = GenerateConfig(max_new_tokens=12, temperature=0.0, do_sample=False,
                        eot_ids=(127,), pad_to=8)


def test_engine_matches_generate_greedy(model_and_params):
    model, params = model_and_params
    prompts = _prompts(model, params, [5, 9, 3])
    ref = _ref(model, params, prompts, GREEDY)
    eng = DecodeEngine(model, params, slots=3, max_len=64, pad_to=8)
    out = eng.generate_all(prompts, GREEDY)
    for r, o in zip(ref, out):
        np.testing.assert_array_equal(r, o)


def test_engine_slot_reuse_single_slot(model_and_params):
    """slots=1 forces strictly sequential occupancy of ONE cache row —
    proves the fresh-row prefill really clears the previous tenant."""
    model, params = model_and_params
    prompts = _prompts(model, params, [6, 4, 10], seed=11)
    ref = _ref(model, params, prompts, GREEDY)
    eng = DecodeEngine(model, params, slots=1, max_len=64, pad_to=8)
    out = eng.generate_all(prompts, GREEDY)
    for r, o in zip(ref, out):
        np.testing.assert_array_equal(r, o)


def test_engine_staggered_admission(model_and_params):
    """A request admitted mid-flight of the others must not perturb them
    (and must itself match its solo decode)."""
    model, params = model_and_params
    prompts = _prompts(model, params, [4, 7, 5], seed=13)
    ref = _ref(model, params, prompts, GREEDY)
    eng = DecodeEngine(model, params, slots=3, max_len=64, pad_to=8)
    u0 = eng.submit(prompts[0], GREEDY)
    u1 = eng.submit(prompts[1], GREEDY)
    for _ in range(5):
        eng.step()
    u2 = eng.submit(prompts[2], GREEDY)   # joins while u0/u1 are decoding
    eng.run_until_idle()
    for uid, r in zip((u0, u1, u2), ref):
        np.testing.assert_array_equal(r, eng.result(uid))


def test_engine_mixed_max_tokens_and_queueing(model_and_params):
    """More requests than slots with different max_new_tokens: early
    finishers free slots for the queue; each result matches its solo run."""
    model, params = model_and_params
    prompts = _prompts(model, params, [5, 5, 5, 5], seed=17)
    cfgs = [GenerateConfig(max_new_tokens=m, temperature=0.0,
                           do_sample=False, eot_ids=(127,), pad_to=8)
            for m in (3, 12, 6, 9)]
    ref = [generate(model, params, p, c, jax.random.PRNGKey(1))
           for p, c in zip(prompts, cfgs)]
    eng = DecodeEngine(model, params, slots=2, max_len=64, pad_to=8)
    uids = [eng.submit(p, c) for p, c in zip(prompts, cfgs)]
    eng.run_until_idle()
    for uid, r in zip(uids, ref):
        np.testing.assert_array_equal(r, eng.result(uid))


def test_engine_sampled_reproducible_across_placement(model_and_params):
    """temperature>0: a request's sampled stream is keyed by (nonce,
    count), so re-running the same submission order with different
    co-tenant timing gives identical streams."""
    model, params = model_and_params
    prompts = _prompts(model, params, [4, 6], seed=19)
    cfg = GenerateConfig(max_new_tokens=8, temperature=0.7, do_sample=True,
                         eot_ids=(127,), pad_to=8)
    eng1 = DecodeEngine(model, params, slots=2, max_len=64, pad_to=8)
    out1 = eng1.generate_all(prompts, cfg)
    # same requests, but serialized through one slot (different placement
    # and co-tenancy) — streams must be unchanged
    eng2 = DecodeEngine(model, params, slots=1, max_len=64, pad_to=8)
    out2 = eng2.generate_all(prompts, cfg)
    for a, b in zip(out1, out2):
        np.testing.assert_array_equal(a, b)


def test_llm_worker_http_concurrent(model_and_params):
    """sglang_worker-parity surface: concurrent HTTP clients share the
    engine; each gets its own decode."""
    import json
    import urllib.request

    from rsvldm_tpu.serving.llm_worker import LLMWorker

    model, params = model_and_params
    eng = DecodeEngine(model, params, slots=2, max_len=64, pad_to=8)

    def embed_prompt(prompt: str):
        ids = jnp.asarray([(ord(c) % 96) + 1 for c in prompt], jnp.int32)
        return model.apply(params, ids, method=model.embed)

    def decode_fn(ids):
        return " ".join(str(i) for i in ids)

    worker = LLMWorker(eng, embed_prompt, decode_fn, worker_name="w0",
                       base_cfg=GREEDY)
    server = worker.serve(host="127.0.0.1", port=0)
    port = server.server_address[1]

    def post(prompt):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/worker_generate",
            json.dumps({"prompt": prompt, "temperature": 0.0,
                        "max_new_tokens": 6}).encode(),
            {"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            return json.loads(r.read())["text"]

    results = {}

    def client(name):
        results[name] = post(name)

    threads = [threading.Thread(target=client, args=(p,))
               for p in ("hello world", "abcdefgh", "zzz")]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # every client got a non-empty, solo-equivalent answer
    for prompt, text in results.items():
        cfg = GenerateConfig(max_new_tokens=6, temperature=0.0,
                             do_sample=False, eot_ids=(127,), pad_to=8)
        ref = generate(model, params, embed_prompt(prompt), cfg,
                       jax.random.PRNGKey(1))
        assert text == decode_fn(ref.tolist()).lstrip()
    worker.stop()
    server.shutdown()


def test_submit_rejects_padded_overflow(model_and_params):
    """The admission guard accounts for prompt PADDING: a prompt whose
    pad bucket exceeds max_len must be rejected at submit() (previously it
    passed the guard, crashed in prefill, and leaked the slot)."""
    model, params = model_and_params
    eng = DecodeEngine(model, params, slots=1, max_len=20, pad_to=8)
    emb = _prompts(model, params, [18], seed=23)[0]
    cfg = GenerateConfig(max_new_tokens=2, temperature=0.0, do_sample=False,
                         eot_ids=(127,), pad_to=8)
    with pytest.raises(ValueError):
        eng.submit(emb, cfg)    # s_pad = 24 > max_len = 20


def test_llm_worker_streaming(model_and_params):
    """/worker_generate_stream streams growing-prefix ndjson frames whose
    final frame equals the solo decode (model_worker generate_stream
    parity)."""
    import json
    import urllib.request

    from rsvldm_tpu.serving.llm_worker import LLMWorker

    model, params = model_and_params
    eng = DecodeEngine(model, params, slots=2, max_len=64, pad_to=8)

    def embed_prompt(prompt: str):
        ids = jnp.asarray([(ord(c) % 96) + 1 for c in prompt], jnp.int32)
        return model.apply(params, ids, method=model.embed)

    def decode_fn(ids):
        return " ".join(str(i) for i in ids)

    worker = LLMWorker(eng, embed_prompt, decode_fn, worker_name="w1",
                       base_cfg=GREEDY)
    server = worker.serve(host="127.0.0.1", port=0)
    port = server.server_address[1]
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/worker_generate_stream",
        json.dumps({"prompt": "stream me", "temperature": 0.0,
                    "max_new_tokens": 8}).encode(),
        {"Content-Type": "application/json"})
    frames = []
    with urllib.request.urlopen(req, timeout=120) as r:
        for line in r:
            if line.strip():
                frames.append(json.loads(line))
    assert frames and frames[-1].get("finished") is True
    # growing prefixes: every frame's text is a prefix of the final text
    final = frames[-1]["text"]
    for f in frames:
        assert final.startswith(f["text"])
    ref = generate(model, params, embed_prompt("stream me"),
                   GenerateConfig(max_new_tokens=8, temperature=0.0,
                                  do_sample=False, eot_ids=(127,), pad_to=8),
                   jax.random.PRNGKey(1))
    assert final == decode_fn(ref.tolist()).lstrip()
    worker.stop()
    server.shutdown()


def test_engine_prefix_cache_matches_full_prompt(model_and_params):
    """register_prefix + submit(suffix, prefix_id=) must reproduce the solo
    `generate` stream for the CONCATENATED prompt — prefix seeding is a
    pure admission-cost optimization, invisible in the output."""
    model, params = model_and_params
    full = _prompts(model, params, [13, 17, 9], seed=23)
    p_len = 6
    ref = _ref(model, params, full, GREEDY)

    eng = DecodeEngine(model, params, slots=2, max_len=64, pad_to=8)
    # every prompt shares its own prefix here; also mix in a prefix-free
    # co-tenant to prove the two admission paths coexist in one pool
    pids = [eng.register_prefix(p[:p_len]) for p in full]
    uids = [eng.submit(p[p_len:], GREEDY, prefix_id=pid)
            for p, pid in zip(full, pids)]
    free_uid = eng.submit(full[0], GREEDY)
    eng.run_until_idle()
    for r, u in zip(ref, uids):
        np.testing.assert_array_equal(r, eng.result(u))
    np.testing.assert_array_equal(ref[0], eng.result(free_uid))


def test_engine_prefix_shared_across_requests_and_slots(model_and_params):
    """ONE registered prefix serves many concurrent requests (and slot
    reuse after eviction) without mutation — the block is never donated."""
    model, params = model_and_params
    rng = np.random.default_rng(31)
    prefix_ids = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(11,)),
                             jnp.int32)
    prefix = model.apply(params, prefix_ids, method=model.embed)
    suffixes = _prompts(model, params, [4, 7, 3, 5], seed=37)
    full = [jnp.concatenate([prefix, s]) for s in suffixes]
    ref = _ref(model, params, full, GREEDY)

    eng = DecodeEngine(model, params, slots=2, max_len=64, pad_to=8)
    pid = eng.register_prefix(prefix)
    uids = [eng.submit(s, GREEDY, prefix_id=pid) for s in suffixes]
    eng.run_until_idle()
    for r, u in zip(ref, uids):
        np.testing.assert_array_equal(r, eng.result(u))


def test_engine_prefix_kv_quant(model_and_params):
    """Prefix seeding carries the int8 KV scale planes through the slot
    insert (kv_quant cache leaves include k_scale/v_scale)."""
    import dataclasses as dc
    model, params = model_and_params
    qcfg = dc.replace(CFG, kv_quant=True)
    qmodel = LlamaModel(qcfg)
    prefix = _prompts(model, params, [9], seed=41)[0]
    suffix = _prompts(model, params, [5], seed=43)[0]
    full = jnp.concatenate([prefix, suffix])
    ref = generate(qmodel, params, full, GREEDY, jax.random.PRNGKey(1))

    eng = DecodeEngine(qmodel, params, slots=2, max_len=64, pad_to=8)
    pid = eng.register_prefix(prefix)
    uid = eng.submit(suffix, GREEDY, prefix_id=pid)
    eng.run_until_idle()
    np.testing.assert_array_equal(ref, eng.result(uid))


def test_engine_prefix_overflow_rejected(model_and_params):
    model, params = model_and_params
    prefix = _prompts(model, params, [24], seed=47)[0]
    suffix = _prompts(model, params, [40], seed=48)[0]
    eng = DecodeEngine(model, params, slots=1, max_len=64, pad_to=8)
    pid = eng.register_prefix(prefix)
    with pytest.raises(ValueError):
        eng.submit(suffix, GREEDY, prefix_id=pid)  # 24+40+12 > 64


def test_llm_worker_prefix_text(model_and_params):
    """Worker-level prefix cache: prompts carrying the shared scaffold
    prefill only their remainder yet produce the solo-equivalent text;
    prompts WITHOUT the scaffold fall back to the full-prompt path."""
    from rsvldm_tpu.serving.llm_worker import LLMWorker

    model, params = model_and_params
    eng = DecodeEngine(model, params, slots=2, max_len=64, pad_to=8)

    def embed_prompt(prompt: str):
        ids = jnp.asarray([(ord(c) % 96) + 1 for c in prompt], jnp.int32)
        return model.apply(params, ids, method=model.embed)

    def decode_fn(ids):
        return " ".join(str(i) for i in ids)

    scaffold = "SYSTEM: you are. "  # char-level embed: any split is safe
    worker = LLMWorker(eng, embed_prompt, decode_fn, worker_name="w1",
                       base_cfg=GREEDY, prefix_text=scaffold)
    for tail in ("hello", "abcdefgh"):
        out = worker.generate_text(scaffold + tail)
        ref = generate(model, params, embed_prompt(scaffold + tail), GREEDY,
                       jax.random.PRNGKey(1))
        assert out == decode_fn(ref.tolist()).lstrip()
    out = worker.generate_text("no scaffold here")
    ref = generate(model, params, embed_prompt("no scaffold here"), GREEDY,
                   jax.random.PRNGKey(1))
    assert out == decode_fn(ref.tolist()).lstrip()
    worker.stop()


def test_engine_chunked_prefill_matches_generate(model_and_params):
    """prefill_chunk splits long-prompt admission into fixed chunks; the
    outputs must equal solo `generate` (short prompts take the normal
    path, chunked + prefix caching compose)."""
    model, params = model_and_params
    prompts = _prompts(model, params, [21, 5, 34], seed=53)
    ref = _ref(model, params, prompts, GREEDY)
    eng = DecodeEngine(model, params, slots=2, max_len=64, pad_to=8,
                       prefill_chunk=8)
    out = eng.generate_all(prompts, GREEDY)
    for r, o in zip(ref, out):
        np.testing.assert_array_equal(r, o)
    # chunked on top of a registered prefix
    pid = eng.register_prefix(prompts[2][:10])
    uid = eng.submit(prompts[2][10:], GREEDY, prefix_id=pid)
    eng.run_until_idle()
    np.testing.assert_array_equal(ref[2], eng.result(uid))


def test_engine_chunked_prefill_interleaves_decode(model_and_params):
    """A long admission must NOT stall a co-tenant: while request B's
    prompt is chunk-prefilling, request A still gains one token per
    step()."""
    model, params = model_and_params
    a, b = _prompts(model, params, [5, 34], seed=59)
    eng = DecodeEngine(model, params, slots=2, max_len=64, pad_to=8,
                       prefill_chunk=8)
    ua = eng.submit(a, GREEDY)
    eng.step()                      # admit A (prefill + first token)
    n0 = len(eng._requests[ua].out_ids)
    ub = eng.submit(b, GREEDY)
    eng.step()                      # admit B -> 1 chunk; A decodes 1 token
    rb = eng._requests[ub]
    assert rb.slot in eng._prefilling and rb.chunk_i == 1
    assert len(eng._requests[ua].out_ids) == n0 + 1
    eng.step()                      # B chunk 2; A decodes again
    assert rb.chunk_i == 2 and not rb.out_ids
    assert len(eng._requests[ua].out_ids) == n0 + 2
    eng.run_until_idle()
    ref_a, ref_b = _ref(model, params, [a, b], GREEDY)
    np.testing.assert_array_equal(ref_a, eng.result(ua))
    np.testing.assert_array_equal(ref_b, eng.result(ub))


def test_llm_worker_multimodal_images(model_and_params):
    """model_worker.py:114-141 parity surface: base64 `images` payloads go
    through embed_mm; output equals solo generate on the same spliced
    embeds; count-mismatch and non-multimodal errors are raised."""
    import base64
    import io

    from PIL import Image

    from rsvldm_tpu.serving.llm_worker import LLMWorker
    model, params = model_and_params
    eng = DecodeEngine(model, params, slots=2, max_len=64, pad_to=8)

    def embed_text(prompt):
        ids = jnp.asarray([min(ord(c), 120) for c in prompt], jnp.int32)
        return model.apply(params, ids, method=model.embed)

    def embed_mm(prompt, pil_images):
        # deterministic fake splice: text embeds + one row per image pixel
        # mean — enough to prove the worker routes images to embed_mm
        rows = [embed_text(prompt.replace("<image>", ""))]
        for im in pil_images:
            v = float(np.asarray(im).mean()) / 255.0
            rows.append(jnp.full((2, CFG.dim), v, jnp.float32))
        return jnp.concatenate(rows, axis=0)

    worker = LLMWorker(eng, embed_text, lambda ids: " ".join(map(str, ids)),
                       worker_name="w-mm", base_cfg=GREEDY,
                       embed_mm=embed_mm)
    img = Image.fromarray(np.full((8, 8, 3), 120, np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()

    prompt = "look <image> here"
    out = worker.generate_text(prompt, images=[b64])
    ref = generate(model, params, embed_mm(prompt, [img]), GREEDY,
                   jax.random.PRNGKey(1))
    assert out == " ".join(map(str, ref.tolist())).lstrip()

    with pytest.raises(ValueError, match="does not match"):
        worker.generate_text("no placeholder", images=[b64])
    worker_text_only = LLMWorker(eng, embed_text, str, worker_name="w-t")
    with pytest.raises(ValueError, match="not multimodal"):
        worker_text_only.generate_text(prompt, images=[b64])
    worker.stop()
    worker_text_only.stop()


SAMPLED = GenerateConfig(max_new_tokens=12, temperature=0.8, do_sample=True,
                         eot_ids=(127,), pad_to=8)


def _engine_ref(model, params, prompts, cfg):
    """Vanilla-ENGINE reference streams (one request at a time, fresh
    engine) — the spec engine must reproduce these exactly."""
    outs = []
    for i, p in enumerate(prompts):
        eng = DecodeEngine(model, params, slots=1, max_len=64, pad_to=8)
        # nonce must match the spec engine's for this submission order
        for _ in range(i):
            next(eng._nonce)
        uid = eng.submit(p, cfg)
        eng.run_until_idle()
        outs.append(eng.result(uid))
    return outs


@pytest.mark.parametrize("cfg", [GREEDY, SAMPLED], ids=["greedy", "sampled"])
def test_engine_speculative_draft_eq_target(model_and_params, cfg):
    """draft == target: every proposal is accepted and the committed
    streams are BIT-IDENTICAL to the vanilla engine, across slots and
    staggered admission."""
    model, params = model_and_params
    prompts = _prompts(model, params, [9, 5, 17], seed=61)
    ref = _engine_ref(model, params, prompts, cfg)
    eng = DecodeEngine(model, params, slots=2, max_len=64, pad_to=8,
                       draft=model, draft_params=params, spec_k=3)
    u0 = eng.submit(prompts[0], cfg)
    u1 = eng.submit(prompts[1], cfg)
    eng.step()
    u2 = eng.submit(prompts[2], cfg)   # queued; admitted on a free slot
    eng.run_until_idle()
    for r, u in zip(ref, (u0, u1, u2)):
        np.testing.assert_array_equal(r, eng.result(u))


def test_engine_speculative_mismatched_draft_greedy_exact(model_and_params):
    """ANY draft keeps greedy output exact — here a 1-layer model with
    different (random) weights proposes mostly-wrong tokens."""
    import dataclasses
    model, params = model_and_params
    dcfg = dataclasses.replace(CFG, layers=1)
    dmodel = LlamaModel(dcfg)
    dparams = dmodel.init(jax.random.PRNGKey(9),
                          jnp.zeros((1, 4), jnp.int32),
                          KVCache.init(dcfg, 1, 8, jnp.float32), 0,
                          method=dmodel.from_tokens)
    prompts = _prompts(model, params, [7, 12], seed=67)
    ref = _engine_ref(model, params, prompts, GREEDY)
    eng = DecodeEngine(model, params, slots=2, max_len=64, pad_to=8,
                       draft=dmodel, draft_params=dparams, spec_k=3)
    outs = eng.generate_all(prompts, GREEDY)
    for r, o in zip(ref, outs):
        np.testing.assert_array_equal(r, o)


def test_engine_speculative_guards(model_and_params):
    model, params = model_and_params
    with pytest.raises(ValueError, match="prefill_chunk"):
        DecodeEngine(model, params, slots=1, max_len=64, pad_to=8,
                     prefill_chunk=8, draft=model, draft_params=params)
    eng = DecodeEngine(model, params, slots=1, max_len=64, pad_to=8,
                       draft=model, draft_params=params)
    pid_engine = DecodeEngine(model, params, slots=1, max_len=64, pad_to=8)
    pid = pid_engine.register_prefix(_prompts(model, params, [8])[0])
    with pytest.raises(ValueError, match="prefix"):
        eng.submit(_prompts(model, params, [8])[0], GREEDY, prefix_id=pid)


def test_engine_tp_matches_single(model_and_params):
    """DecodeEngine(mesh=): TP-sharded params + kv-head-sharded pool
    produce the same streams as the single-chip engine (greedy + spec)."""
    from jax.sharding import Mesh
    model, params = model_and_params
    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
    prompts = _prompts(model, params, [9, 14], seed=71)
    ref = _engine_ref(model, params, prompts, GREEDY)
    eng = DecodeEngine(model, params, slots=2, max_len=64, pad_to=8,
                       mesh=mesh)
    outs = eng.generate_all(prompts, GREEDY)
    for r, o in zip(ref, outs):
        np.testing.assert_array_equal(r, o)
    # speculative round under TP (draft == target): still engine-exact
    eng2 = DecodeEngine(model, params, slots=2, max_len=64, pad_to=8,
                        mesh=mesh, draft=model, draft_params=params,
                        spec_k=2)
    outs2 = eng2.generate_all(prompts, GREEDY)
    for r, o in zip(ref, outs2):
        np.testing.assert_array_equal(r, o)


def test_engine_release_and_state_cleanup(model_and_params):
    """Long-running workers must not accumulate per-request state: done
    requests drop their device arrays, release() forgets the uid."""
    model, params = model_and_params
    prompts = _prompts(model, params, [5], seed=23)
    eng = DecodeEngine(model, params, slots=1, max_len=64, pad_to=8)
    uid = eng.submit(prompts[0], GREEDY)
    eng.run_until_idle()
    req = eng._requests[uid]
    assert req.done
    assert req.embeds is None and req.chunk_emb is None and req.row is None
    eng.result(uid)                      # still readable before release
    eng.release(uid)
    assert uid not in eng._requests
    eng.release(uid)                     # idempotent


def test_engine_frames_never_contain_eot(model_and_params):
    """The EOT token must never be observable in out_ids (streaming frames
    read out_ids concurrently — an append-then-pop would transiently show
    the stop token and the next frame would shrink)."""
    model, params = model_and_params
    prompts = _prompts(model, params, [6, 4], seed=29)
    # every vocab id is an eot EXCEPT the ones the model actually emits is
    # unknowable up front — instead decode greedily and re-run with the
    # 3rd emitted token as EOT, asserting the stream stops BEFORE it
    eng0 = DecodeEngine(model, params, slots=1, max_len=64, pad_to=8)
    full = eng0.generate_all(prompts[:1], GREEDY)[0]
    assert len(full) >= 4
    stop = int(full[3])
    cfg = GenerateConfig(max_new_tokens=12, temperature=0.0, do_sample=False,
                         eot_ids=(stop,), pad_to=8)
    eng = DecodeEngine(model, params, slots=1, max_len=64, pad_to=8)
    uid = eng.submit(prompts[0], cfg)
    snapshots = []
    while not eng._requests[uid].done:
        eng.step()
        snapshots.append(list(eng._requests[uid].out_ids))
    for snap in snapshots:
        assert stop not in snap
    # prefix of the unrestricted stream, cut at the stop token
    np.testing.assert_array_equal(eng.result(uid), full[:3])


def test_engine_fail_all_wakes_waiters(model_and_params):
    model, params = model_and_params
    prompts = _prompts(model, params, [5, 7], seed=31)
    eng = DecodeEngine(model, params, slots=1, max_len=64, pad_to=8)
    u0 = eng.submit(prompts[0], GREEDY)
    u1 = eng.submit(prompts[1], GREEDY)   # queued behind the single slot
    eng.step()
    eng.fail_all("injected failure")
    for uid in (u0, u1):
        assert eng._requests[uid].event.is_set()
        with pytest.raises(RuntimeError, match="injected failure"):
            eng.result(uid)
    # the engine remains usable for new work after the reset
    u2 = eng.submit(prompts[0], GREEDY)
    eng.run_until_idle()
    ref = _ref(model, params, prompts[:1], GREEDY)[0]
    np.testing.assert_array_equal(ref, eng.result(u2))


def test_llm_worker_driver_survives_step_exception(model_and_params):
    """One engine.step() exception fails in-flight requests with a JSON-able
    error and the driver thread keeps serving later requests."""
    from rsvldm_tpu.serving.llm_worker import LLMWorker

    model, params = model_and_params
    eng = DecodeEngine(model, params, slots=1, max_len=64, pad_to=8)
    boom = {"armed": True}
    real_step = eng.step

    def flaky_step():
        # fail exactly once, on a step that actually has work in flight
        # (the idle driver polls step() before anything is submitted)
        if boom["armed"] and (eng._active or eng._waiting):
            boom["armed"] = False
            raise RuntimeError("transient device error")
        return real_step()

    eng.step = flaky_step

    def embed_prompt(prompt: str):
        ids = jnp.asarray([(ord(c) % 96) + 1 for c in prompt], jnp.int32)
        return model.apply(params, ids, method=model.embed)

    decode_fn = lambda ids: " ".join(str(i) for i in ids)
    worker = LLMWorker(eng, embed_prompt, decode_fn, worker_name="w2",
                       base_cfg=GREEDY)
    # first request hits the injected failure on its first driven step
    with pytest.raises(RuntimeError, match="transient device error"):
        worker.generate_text("first request")
    # the driver thread is still alive: later requests complete
    out = worker.generate_text("second request")
    ref = generate(model, params, embed_prompt("second request"), GREEDY,
                   jax.random.PRNGKey(1))
    assert out == decode_fn(ref.tolist()).lstrip()
    assert worker.queue_length == 0
    assert not eng._requests  # released after both requests
    worker.stop()


# -- decode horizon (multi-step scheduling) ---------------------------------

def test_engine_horizon_matches_generate_greedy(model_and_params):
    """decode_horizon=4: greedy streams are bit-identical to the plain
    `generate` path, through staggered admission (which forces the
    single-step fallback while work is queued) and slot reuse."""
    model, params = model_and_params
    prompts = _prompts(model, params, [5, 9, 3], seed=37)
    ref = _ref(model, params, prompts, GREEDY)
    eng = DecodeEngine(model, params, slots=2, max_len=64, pad_to=8,
                       decode_horizon=4)
    u0 = eng.submit(prompts[0], GREEDY)
    u1 = eng.submit(prompts[1], GREEDY)
    for _ in range(2):
        eng.step()
    u2 = eng.submit(prompts[2], GREEDY)   # queued behind the 2 slots
    eng.run_until_idle()
    for uid, r in zip((u0, u1, u2), ref):
        np.testing.assert_array_equal(r, eng.result(uid))


def test_engine_horizon_sampled_bit_identical(model_and_params):
    """temperature>0: the (nonce, count) key schedule is computed in-scan,
    so horizon-H sampled streams equal the horizon-1 engine's exactly."""
    model, params = model_and_params
    prompts = _prompts(model, params, [4, 6], seed=41)
    cfg = GenerateConfig(max_new_tokens=11, temperature=0.7, do_sample=True,
                         eot_ids=(127,), pad_to=8)
    base = DecodeEngine(model, params, slots=2, max_len=64, pad_to=8)
    out1 = base.generate_all(prompts, cfg)
    eng = DecodeEngine(model, params, slots=2, max_len=64, pad_to=8,
                       decode_horizon=4)
    outh = eng.generate_all(prompts, cfg)
    for a, b in zip(out1, outh):
        np.testing.assert_array_equal(a, b)


def test_engine_horizon_trims_at_stop(model_and_params):
    """A row stopping mid-burst (EOT or max_new) is trimmed on host: the
    result equals the solo decode, co-tenants are unperturbed, and the
    freed slot is correctly reused by the next prefill."""
    model, params = model_and_params
    prompts = _prompts(model, params, [5, 5, 7], seed=43)
    # pick an EOT that fires mid-stream (and mid-burst: index 5 with
    # horizon 4 lands inside the second burst) from an unrestricted run
    # eot 999 is outside the vocab — it never fires (generate() cannot
    # express an empty eot set: it indexes eot[0])
    noeot = GenerateConfig(max_new_tokens=12, temperature=0.0,
                           do_sample=False, eot_ids=(999,), pad_to=8)
    full = DecodeEngine(model, params, slots=1, max_len=64,
                        pad_to=8).generate_all(prompts[:1], noeot)[0]
    assert len(full) >= 6
    stop = int(full[5])
    cfg = GenerateConfig(max_new_tokens=12, temperature=0.0,
                         do_sample=False, eot_ids=(stop,), pad_to=8)
    # max_new=6 stops row 1 mid-burst without an EOT
    cfg_short = GenerateConfig(max_new_tokens=6, temperature=0.0,
                               do_sample=False, eot_ids=(999,), pad_to=8)
    ref = [generate(model, params, p, c, jax.random.PRNGKey(1))
           for p, c in zip(prompts, (cfg, cfg_short, cfg))]
    eng = DecodeEngine(model, params, slots=2, max_len=64, pad_to=8,
                       decode_horizon=4)
    uids = [eng.submit(p, c)
            for p, c in zip(prompts, (cfg, cfg_short, cfg))]
    eng.run_until_idle()
    for uid, r in zip(uids, ref):
        np.testing.assert_array_equal(r, eng.result(uid))
    assert stop not in eng.result(uids[0])


def test_engine_horizon_scheduler_policy(model_and_params):
    """The multi-step path runs ONLY when the scheduler is idle: queued
    admissions and chunked prefills force single steps; an empty queue with
    a full horizon of work left uses one dispatch per H tokens."""
    model, params = model_and_params
    prompts = _prompts(model, params, [5, 5], seed=47)
    eng = DecodeEngine(model, params, slots=1, max_len=64, pad_to=8,
                       decode_horizon=4)
    calls = {"multi": 0, "single": 0}
    real_multi, real_single = eng._decode_multi, eng._decode

    def count_multi(*a, **k):
        assert not eng._waiting and not eng._prefilling
        calls["multi"] += 1
        return real_multi(*a, **k)

    def count_single(*a, **k):
        calls["single"] += 1
        return real_single(*a, **k)

    eng._decode_multi, eng._decode = count_multi, count_single
    # eot 999 is outside the vocab — it never fires (generate() cannot
    # express an empty eot set: it indexes eot[0])
    noeot = GenerateConfig(max_new_tokens=12, temperature=0.0,
                           do_sample=False, eot_ids=(999,), pad_to=8)
    u0 = eng.submit(prompts[0], noeot)
    u1 = eng.submit(prompts[1], noeot)   # waiting: slot count is 1
    eng.run_until_idle()
    # 12 greedy tokens each: 1 from prefill + 11 decoded; u0 decodes
    # entirely under a non-empty queue (single steps), u1 alone rides
    # the horizon (2 full bursts of 4 + 3 singles)
    assert calls["single"] == 11 + 3
    assert calls["multi"] == 2
    ref = _ref(model, params, prompts, noeot)
    for uid, r in zip((u0, u1), ref):
        np.testing.assert_array_equal(r, eng.result(uid))


def test_engine_horizon_guards(model_and_params):
    model, params = model_and_params
    with pytest.raises(ValueError, match="decode_horizon"):
        DecodeEngine(model, params, slots=1, max_len=64, pad_to=8,
                     decode_horizon=0)
    with pytest.raises(ValueError, match="decode_horizon"):
        DecodeEngine(model, params, slots=1, max_len=64, pad_to=8,
                     decode_horizon=4, draft=model, draft_params=params)
