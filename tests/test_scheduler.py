"""Scheduler behavior: chunked prefill, prefill/decode interleave,
preemption (reference scheduler.rs semantics)."""

from vllm_rs_tpu.config import SamplingParams, SchedulerConfig
from vllm_rs_tpu.core.block_manager import BlockManager
from vllm_rs_tpu.core.scheduler import Scheduler
from vllm_rs_tpu.core.sequence import Sequence, SequenceStatus


def make(num_blocks=64, block_size=4, **kw):
    defaults = dict(
        max_num_seqs=8,
        chunk_size=16,
        max_model_len=128,
        prefill_buckets=(4, 8, 16),
        max_consecutive_prefills=2,
    )
    defaults.update(kw)
    cfg = SchedulerConfig(**defaults)
    bm = BlockManager(num_blocks, block_size)
    return Scheduler(cfg, bm), bm


def seq_of(n_prompt, **kw):
    return Sequence(list(range(1, n_prompt + 1)), SamplingParams(**kw))


def test_chunked_prefill_requeue():
    sched, _ = make()
    s = seq_of(40)  # needs 3 chunks of 16
    sched.add(s)
    b1 = sched.schedule()
    assert b1.kind == "prefill" and b1.chunk_sizes == [16]
    sched.postprocess(b1, [0])
    assert s.num_cached_tokens == 16
    assert not sched.running  # still prefilling
    b2 = sched.schedule()
    assert b2.chunk_sizes == [16]
    sched.postprocess(b2, [0])
    b3 = sched.schedule()
    assert b3.chunk_sizes == [8]
    sched.postprocess(b3, [42])
    assert s.prefill_done
    assert s.output_token_ids == [42]
    assert s.status == SequenceStatus.RUNNING


def test_small_prompt_packing():
    sched, _ = make()
    for _ in range(4):
        sched.add(seq_of(3))
    b = sched.schedule()
    assert b.kind == "prefill"
    assert len(b.seqs) == 4  # tier 4, rows = 16/4 = 4
    assert b.chunk_sizes == [3, 3, 3, 3]


def test_prefill_decode_interleave_fairness():
    sched, _ = make(max_consecutive_prefills=2)
    s0 = seq_of(4)
    sched.add(s0)
    b = sched.schedule()
    sched.postprocess(b, [1])
    assert s0.status == SequenceStatus.RUNNING
    # flood with waiting prefills; decodes must still get scheduled
    for _ in range(10):
        sched.add(seq_of(4))
    kinds = []
    for _ in range(6):
        b = sched.schedule()
        kinds.append(b.kind)
        sched.postprocess(b, [1] * len(b.seqs))
    assert "decode" in kinds


def test_finish_on_eos_and_max_tokens():
    sched, bm = make()
    sched.set_eos_token_ids((0,))
    s1 = seq_of(4, max_tokens=100)
    s2 = seq_of(4, max_tokens=2, ignore_eos=True)
    sched.add(s1)
    sched.add(s2)
    b = sched.schedule()
    sched.postprocess(b, [5, 5])  # both prefill-done, one token each
    b = sched.schedule()
    assert b.kind == "decode"
    sched.postprocess(b, [0, 7])  # s1 hits EOS; s2 hits max_tokens (2)
    assert s1.is_finished and s1.finish_reason.value == "stop"
    assert s2.is_finished and s2.finish_reason.value == "length"
    assert not sched.running
    bm.check_invariants()


def test_preemption_recompute_on_kv_exhaustion():
    # 8 blocks of 4 → 32 slots total
    sched, bm = make(num_blocks=8, prefix_cache_enabled=False)
    a = seq_of(12, max_tokens=50, ignore_eos=True)  # 3 blocks
    b = seq_of(12, max_tokens=50, ignore_eos=True)  # 3 blocks
    sched.add(a)
    sched.add(b)
    batch = sched.schedule()
    sched.postprocess(batch, [1] * len(batch.seqs))
    while not (a.prefill_done and b.prefill_done):
        batch = sched.schedule()
        sched.postprocess(batch, [1] * len(batch.seqs))
    # decode until blocks run out; scheduler must preempt the youngest (b)
    preempted = False
    for _ in range(40):
        batch = sched.schedule()
        if batch.is_empty:
            break
        if b.status == SequenceStatus.WAITING and not b.is_finished:
            preempted = True
            break
        sched.postprocess(batch, [1] * len(batch.seqs))
    assert preempted
    assert a.status == SequenceStatus.RUNNING


def test_stop_strings_keep_multistep():
    """`stop` must not collapse multi-step decode to k=1 (VERDICT r4 weak
    #2): detection + trimming happen at burst delivery in the engine."""
    sched, _ = make(multi_step_decode=8)
    a = seq_of(4, max_tokens=64, ignore_eos=True, stop=["never"])
    b = seq_of(4, max_tokens=64, ignore_eos=True)
    sched.add(a)
    sched.add(b)
    batch = sched.schedule()
    assert batch.kind == "prefill"
    sched.postprocess(batch, [1] * len(batch.seqs))
    batch = sched.schedule()
    assert batch.kind == "decode"
    assert batch.n_steps == 8


def test_guided_rows_alternate_with_plain():
    """Guided rows need per-token host work (k=1), but must not drag plain
    co-scheduled rows down: the scheduler alternates a multi-step plain
    sub-batch with a single-step guided sub-batch."""
    sched, _ = make(multi_step_decode=8)
    g = seq_of(4, max_tokens=64, ignore_eos=True)
    g.guidance = object()  # any non-None marks the row guided
    p = seq_of(4, max_tokens=64, ignore_eos=True)
    sched.add(g)
    sched.add(p)
    batch = sched.schedule()
    sched.postprocess(batch, [1] * len(batch.seqs))
    kinds = []
    for _ in range(4):
        batch = sched.schedule()
        assert batch.kind == "decode"
        rows = tuple(s is g for s in batch.seqs)
        kinds.append((rows, batch.n_steps))
        if batch.n_steps > 1:
            toks = [[1] * batch.n_steps for _ in batch.seqs]
        else:
            toks = [1] * len(batch.seqs)
        sched.postprocess(batch, toks)
    guided_rounds = [k for k in kinds if k[0] == (True,)]
    plain_rounds = [k for k in kinds if k[0] == (False,)]
    assert len(guided_rounds) == 2 and len(plain_rounds) == 2
    assert all(k[1] == 1 for k in guided_rounds)
    assert all(k[1] == 8 for k in plain_rounds)


def test_all_guided_stays_single_step():
    sched, _ = make(multi_step_decode=8)
    g1 = seq_of(4, max_tokens=64, ignore_eos=True)
    g2 = seq_of(4, max_tokens=64, ignore_eos=True)
    g1.guidance = object()
    g2.guidance = object()
    sched.add(g1)
    sched.add(g2)
    batch = sched.schedule()
    sched.postprocess(batch, [1] * len(batch.seqs))
    batch = sched.schedule()
    assert batch.kind == "decode"
    assert len(batch.seqs) == 2 and batch.n_steps == 1


def test_no_admission_past_max_num_seqs():
    """With running at max_num_seqs, prefill must admit NOTHING — one more
    row overflows the fixed decode bucket (found by the Poisson bench:
    staggered arrival into a full engine IndexError'd run_multi)."""
    sched, _ = make(max_num_seqs=2, multi_step_decode=4)
    a = seq_of(4, max_tokens=64, ignore_eos=True)
    b = seq_of(4, max_tokens=64, ignore_eos=True)
    sched.add(a)
    sched.add(b)
    batch = sched.schedule()
    sched.postprocess(batch, [1] * len(batch.seqs))
    assert len(sched.running) == 2
    late = seq_of(4, max_tokens=8, ignore_eos=True)
    sched.add(late)
    for _ in range(6):
        batch = sched.schedule()
        assert len(batch.seqs) + len(sched.running) <= 2 or (
            batch.kind == "decode" and len(batch.seqs) <= 2
        )
        assert late not in batch.seqs
        if batch.kind == "decode":
            toks = (
                [[1] * batch.n_steps for _ in batch.seqs]
                if batch.n_steps > 1
                else [1] * len(batch.seqs)
            )
        else:
            toks = [1] * len(batch.seqs)
        sched.postprocess(batch, toks)
        assert len(sched.running) <= 2


def test_admission_coalescing_batches_trickled_capacity():
    """With coalescing on, a head arrival into a busy engine waits (a
    bounded number of schedule rounds) until a fuller row batch can start
    together; the passover bound guarantees eventual admission."""
    sched, _ = make(
        max_num_seqs=4, admission_coalesce_rows=3, admission_coalesce_steps=4,
        multi_step_decode=4,
    )
    a = seq_of(4, max_tokens=64, ignore_eos=True)
    sched.add(a)
    b1 = sched.schedule()
    sched.postprocess(b1, [1])
    # three late arrivals; capacity is 3 >= min(3, rows=3) -> admit at once
    lates = [seq_of(4, max_tokens=8, ignore_eos=True) for _ in range(3)]
    for s in lates:
        sched.add(s)
    b = sched.schedule()
    assert b.kind == "prefill" and len(b.seqs) == 3
    sched.postprocess(b, [1, 1, 1])

    # a QUEUE of arrivals with capacity 1 < rows=2 is held back (a single
    # waiting arrival would admit immediately — want = min(waiting, rows))
    sched2, _ = make(
        max_num_seqs=3, admission_coalesce_rows=2, admission_coalesce_steps=3,
        multi_step_decode=4,
    )
    x = seq_of(4, max_tokens=64, ignore_eos=True)
    y = seq_of(4, max_tokens=64, ignore_eos=True)
    sched2.add(x)
    sched2.add(y)
    sched2.postprocess(sched2.schedule(), [1, 1])
    late = seq_of(4, max_tokens=8, ignore_eos=True)
    late2 = seq_of(4, max_tokens=8, ignore_eos=True)
    sched2.add(late)
    sched2.add(late2)
    held_rounds = 0
    for _ in range(10):
        batch = sched2.schedule()
        if late in batch.seqs:
            break
        held_rounds += 1
        toks = (
            [[1] * batch.n_steps for _ in batch.seqs]
            if batch.kind == "decode" and batch.n_steps > 1
            else [1] * len(batch.seqs)
        )
        sched2.postprocess(batch, toks)
    # ... but the passover bound (3) forces admission eventually
    assert late in batch.seqs
    assert 1 <= held_rounds <= 4


def test_mixed_tier_prompts_pack_one_step():
    """Mixed-length arrivals pack into ONE prefill step: the batch tier
    raises greedily over the window (rows pad up) instead of breaking on
    the first different-length follower (the Poisson trickle fix)."""
    sched, _ = make(chunk_size=64, prefill_buckets=(4, 8, 16, 32))
    sizes = [3, 14, 7, 30]  # tiers 4, 16, 8, 32 — old rule: batch of 1
    for n in sizes:
        sched.add(seq_of(n))
    b = sched.schedule()
    assert b.kind == "prefill"
    # tier raises 4 -> 16 over the first three rows (3*16 = 48 <= 64);
    # the 30-token fourth would need tier 32 (4*32 > 64) -> next step
    assert b.chunk_sizes == [3, 14, 7]
    sched.postprocess(b, [1, 1, 1])


def test_long_prefill_still_runs_solo():
    sched, _ = make(chunk_size=16)
    sched.add(seq_of(40))  # needs 3 chunks of 16 — top tier, solo
    sched.add(seq_of(3))
    b = sched.schedule()
    assert b.chunk_sizes == [16]


def test_chunk_clamped_to_largest_tier():
    """chunk_size bigger than every prefill bucket: chunks clamp to the
    max tier instead of building a descriptor no executable shape fits
    (chunk 8192 + a >2048-token prompt used to crash the runner)."""
    sched, _ = make(
        num_blocks=512, chunk_size=64, prefill_buckets=(4, 8, 16),
        max_model_len=256,
    )
    sched.add(seq_of(50, max_tokens=4, ignore_eos=True))
    sched.add(seq_of(50, max_tokens=4, ignore_eos=True))
    b = sched.schedule()
    assert b.kind == "prefill"
    # both long prompts take max-tier (16) chunks, packed 2 per step
    assert b.chunk_sizes == [16, 16]
