"""On-device training-batch sampler.

The reference assembles every batch in Python (random.choices over
providers, per-sample mmap reads, numpy SpecAugment -- data.py:540-569),
serially between train steps; SURVEY.md §7 identifies this as its biggest
throughput sin.  Here the entire training corpus is resident in HBM as one
flat uint16 array, and batch assembly -- weighted provider choice,
clip choice, truncation-window selection, left-zero-padding, uint16->f32
scaling and SpecAugment -- is a single jitted function of a PRNG key,
fusable into the train step (zero host work per step).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

FEATURE_SCALE = 0.0390625
MAX_CUTOFFS = 8

# Edge padding (zero frames) added around the packed corpus at pack time,
# and the wide-row gather factor.  The training window gather is the
# hottest op in the spectrogram step (~9 ns per 80-byte frame row on a
# v5e); gathering WIDE rows -- the same buffer reinterpreted as
# [total/K, 40*K] -- cuts the row count K-fold, and a K-way masked select
# realigns the start parity.  Measured in the production private-batch
# population step: 2410 -> 4700 aggregate member-steps/s at K=4 (the
# VERDICT r4 item-2 attack; K=8 measured no better).  The edge padding
# makes every window's contiguous frame range in-bounds without per-frame
# clamping (out-of-window frames are zeroed by the valid mask anyway), and
# rounds the total to a multiple of WIDE_K so the wide reshape is exact.
EDGE_PAD = 512
WIDE_K = 4

# truncation strategy ids
RANDOM, TRUNCATE_START, TRUNCATE_END, FIXED_RIGHT_CUTOFF = 0, 1, 2, 3
_STRATEGY_IDS = {
    "random": RANDOM,
    "truncate_start": TRUNCATE_START,
    "truncate_end": TRUNCATE_END,
    "fixed_right_cutoff": FIXED_RIGHT_CUTOFF,
    # "split"/"none" are eval-only strategies; training samplers treat
    # them as random (the reference never trains with them).
    "split": RANDOM,
    "none": RANDOM,
}


@flax.struct.dataclass
class PackedTrainingData:
    """All training spectrograms + provider metadata as device arrays."""

    frames: jnp.ndarray  # [total_frames, n_features] uint16
    clip_offset: jnp.ndarray  # [n_clips] int32 frame offset
    clip_length: jnp.ndarray  # [n_clips] int32
    provider_logits: jnp.ndarray  # [P] f32 log sampling weight
    provider_clip_start: jnp.ndarray  # [P] int32 index into clip_* arrays
    provider_clip_count: jnp.ndarray  # [P] int32
    provider_label: jnp.ndarray  # [P] f32
    provider_penalty: jnp.ndarray  # [P] f32
    provider_strategy: jnp.ndarray  # [P] int32
    provider_cutoffs: jnp.ndarray  # [P, MAX_CUTOFFS] int32
    provider_n_cutoffs: jnp.ndarray  # [P] int32
    # static: zero-frame padding around the corpus (pack_training_arrays).
    # > 0 enables the wide-row gather fast path in sample_batch; 0 (e.g.
    # hand-built corpora) keeps the per-frame-row gather.
    edge_pad: int = flax.struct.field(pytree_node=False, default=0)


def pack_training_arrays(
    providers, shard_index: int | None = None, shard_count: int | None = None
) -> dict:
    """Concatenates every provider's training split into HOST (numpy)
    arrays, keyed by PackedTrainingData field name.  pack_training_data
    uploads the result to device; the host-streaming corpus mode
    (data/host_stream.py) keeps ``frames`` in host RAM instead when the
    corpus exceeds the per-device HBM budget.

    Multi-host input sharding: host h keeps clips ``i % shard_count ==
    shard_index`` of every store (deterministic, disjoint, near-balanced) so
    each process uploads only its slice of the corpus; defaults to
    jax.process_index()/process_count() (single host: everything).
    """
    if shard_index is None:
        shard_index = jax.process_index()
    if shard_count is None:
        shard_count = jax.process_count()
    frames_parts, offsets, lengths = [], [], []
    p_logit, p_start, p_count, p_label, p_penalty, p_strategy = [], [], [], [], [], []
    p_cutoffs, p_ncut = [], []
    frame_pos = 0
    clip_pos = 0
    for p in providers:
        n_clips = 0
        if getattr(p, "stores", None) is None:
            # Pool-materializing provider (e.g. ClipsFeatureSet): generate
            # this host's shard of freshly augmented spectrograms.
            arr, clip_lens = p.generate_pool(shard_index, shard_count)
            if len(clip_lens):
                offs = np.concatenate([[0], np.cumsum(clip_lens)])[:-1] + frame_pos
                frames_parts.append(arr)
                offsets.append(offs)
                lengths.append(clip_lens)
                frame_pos += arr.shape[0]
                n_clips += len(clip_lens)
        else:
            for store in p.stores["training"]:
                if shard_count > 1:
                    keep = np.arange(shard_index, len(store), shard_count)
                    if len(keep) == 0:
                        continue
                    clip_lens = np.diff(store.offsets)[keep]
                    arr = np.concatenate(
                        [
                            store.data[store.offsets[i] : store.offsets[i + 1]]
                            for i in keep
                        ]
                    )
                    offs = np.concatenate([[0], np.cumsum(clip_lens)])[:-1] + frame_pos
                else:
                    arr = np.ascontiguousarray(store.data)
                    clip_lens = np.diff(store.offsets)
                    offs = np.asarray(store.offsets[:-1], np.int64) + frame_pos
                frames_parts.append(arr)
                offsets.append(offs)
                lengths.append(clip_lens)
                frame_pos += arr.shape[0]
                n_clips += len(clip_lens)
        if n_clips == 0:
            continue
        p_logit.append(np.log(p.sampling_weight) if p.sampling_weight > 0 else -1e30)
        p_start.append(clip_pos)
        p_count.append(n_clips)
        p_label.append(p.label)
        p_penalty.append(p.penalty_weight)
        p_strategy.append(_STRATEGY_IDS[p.truncation_strategy])
        cuts = list(p.fixed_right_cutoffs)[:MAX_CUTOFFS]
        p_cutoffs.append(cuts + [0] * (MAX_CUTOFFS - len(cuts)))
        p_ncut.append(len(cuts))
        clip_pos += n_clips
    if not frames_parts:
        raise ValueError("no training spectrograms found in any provider")
    # Edge padding for the wide-row gather (see EDGE_PAD note): zero frames
    # before the first clip and after the last, end-padded so the total is
    # a multiple of WIDE_K.
    total = sum(p.shape[0] for p in frames_parts)
    width = frames_parts[0].shape[1]
    dtype = frames_parts[0].dtype
    end_pad = EDGE_PAD + (-(EDGE_PAD + total)) % WIDE_K
    frames_parts = (
        [np.zeros((EDGE_PAD, width), dtype)]
        + frames_parts
        + [np.zeros((end_pad, width), dtype)]
    )
    return dict(
        frames=np.concatenate(frames_parts, axis=0),
        edge_pad=EDGE_PAD,
        clip_offset=(np.concatenate(offsets) + EDGE_PAD).astype(np.int32),
        clip_length=np.concatenate(lengths).astype(np.int32),
        provider_logits=np.asarray(p_logit, np.float32),
        provider_clip_start=np.asarray(p_start, np.int32),
        provider_clip_count=np.asarray(p_count, np.int32),
        provider_label=np.asarray(p_label, np.float32),
        provider_penalty=np.asarray(p_penalty, np.float32),
        provider_strategy=np.asarray(p_strategy, np.int32),
        provider_cutoffs=np.asarray(p_cutoffs, np.int32),
        provider_n_cutoffs=np.asarray(p_ncut, np.int32),
    )


def upload_training_arrays(arrays: dict) -> PackedTrainingData:
    """pack_training_arrays dict -> device-resident PackedTrainingData
    (edge_pad stays a static int)."""
    return PackedTrainingData(
        edge_pad=int(arrays.get("edge_pad", 0)),
        **{k: jnp.asarray(v) for k, v in arrays.items() if k != "edge_pad"},
    )


def pack_training_data(
    providers, shard_index: int | None = None, shard_count: int | None = None
) -> PackedTrainingData:
    """pack_training_arrays uploaded to the default device (HBM-resident)."""
    return upload_training_arrays(
        pack_training_arrays(providers, shard_index, shard_count)
    )


def gather_windows(array, off, n, start, length):
    """Gathers [B] windows of ``length`` rows from a packed ragged array.

    array: [total_rows, W]; off/n: [B] clip row-offset and row-count;
    start: [B] window start RELATIVE to the clip (may be negative for
    short clips = leading silence, or exceed n-length for fixed cutoffs).
    Returns (windows [B, length, W] in array dtype, valid [B, length] bool).

    Implementation note (the hottest op in training; trace evidence in
    documentation/architecture.md): this is a clamped per-row gather.
    Contiguous-slice alternatives (vmap(dynamic_slice) / lax.gather with
    slice_sizes=(length, W), with an in-window shift gather correcting
    short-clip alignment) were implemented and measured SLOWER in the
    production step on a v5e: XLA serialized the vmapped slice into a
    per-sample while loop, and the shift-correction take_along_axis cost as
    much as the original gather.  Measured per-row gather cost is ~3-9 ns/row
    (wider rows amortize better), so the effective levers are row width
    (audio chunks: 320 B/row) and total row count (population training
    shares one batch across members), not the gather formulation.
    """
    rel = start[:, None] + jnp.arange(length)[None, :]  # [B, L]
    valid = (rel >= 0) & (rel < n[:, None])
    rows = off[:, None] + jnp.clip(rel, 0, (n - 1)[:, None])
    windows = jnp.take(array, rows, axis=0)
    return windows, valid


def apply_spec_augment(
    rng: jax.Array,
    feats: jnp.ndarray,
    time_mask_max_size: int,
    time_mask_count: int,
    freq_mask_max_size: int,
    freq_mask_count: int,
) -> jnp.ndarray:
    """Vectorized per-sample SpecAugment (reference data.py:32-71 semantics:
    size ~ floor(U[0,max)), start ~ randint(0, dim-size) inclusive)."""
    b, t, f = feats.shape
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (b, t), 1)
    f_iota = jax.lax.broadcasted_iota(jnp.int32, (b, f), 1)
    for _ in range(time_mask_count):
        rng, r1, r2 = jax.random.split(rng, 3)
        size = jnp.floor(
            jax.random.uniform(r1, (b,)) * time_mask_max_size
        ).astype(jnp.int32)
        start = jnp.floor(
            jax.random.uniform(r2, (b,)) * (t - size + 1).astype(jnp.float32)
        ).astype(jnp.int32)
        keep = (t_iota < start[:, None]) | (t_iota >= (start + size)[:, None])
        feats = feats * keep[:, :, None]
    for _ in range(freq_mask_count):
        rng, r1, r2 = jax.random.split(rng, 3)
        size = jnp.floor(
            jax.random.uniform(r1, (b,)) * freq_mask_max_size
        ).astype(jnp.int32)
        start = jnp.floor(
            jax.random.uniform(r2, (b,)) * (f - size + 1).astype(jnp.float32)
        ).astype(jnp.int32)
        keep = (f_iota < start[:, None]) | (f_iota >= (start + size)[:, None])
        feats = feats * keep[:, None, :]
    return feats


HOP_SAMPLES = 160  # 10 ms at 16 kHz (the default window_step_ms=10 hop)
WINDOW_CHUNKS = 3  # 480-sample frontend window = 3 hop chunks at 10 ms
WINDOW_SAMPLES = 480  # 30 ms frontend window at 16 kHz


def window_chunks_for_hop(hop_samples: int) -> int:
    """Chunk rows a 480-sample frontend window spans (ceil).  3 at the
    10 ms hop (exact), 2 at the 20 ms hop (640 gathered, 480 used)."""
    return -(-WINDOW_SAMPLES // hop_samples)


@flax.struct.dataclass
class PackedAudioData:
    """Raw-audio training corpus resident in HBM, hop-aligned.

    Audio is stored as [total_chunks, hop_samples] int16 (one row = one
    feature hop: 160 samples at the 10 ms step, 320 at the reference's
    20 ms default step -- model_train_eval.py:61, SURVEY §8.8); every clip
    is zero-padded to a whole number of chunks so window gathers are
    chunk-row gathers (small index arrays, no per-sample gather).  The
    on-the-fly training mode (reference ClipsHandlerWrapperGenerator,
    data.py:324-402) samples windows from here and computes the frontend
    INSIDE the jitted train step.
    """

    chunks: jnp.ndarray  # [total_chunks, hop_samples] int16
    clip_offset: jnp.ndarray  # [n_clips] int32 chunk offset
    clip_chunks: jnp.ndarray  # [n_clips] int32 chunk count
    provider_logits: jnp.ndarray  # [P] f32
    provider_clip_start: jnp.ndarray  # [P] int32
    provider_clip_count: jnp.ndarray  # [P] int32
    provider_label: jnp.ndarray  # [P] f32
    provider_penalty: jnp.ndarray  # [P] f32
    provider_strategy: jnp.ndarray  # [P] int32
    # static (jit-time) hop width; 16 * window_step_ms
    hop_samples: int = flax.struct.field(pytree_node=False, default=HOP_SAMPLES)
    # static: zero-chunk edge padding (enables the wide-row gather; see
    # PackedTrainingData.edge_pad)
    edge_pad: int = flax.struct.field(pytree_node=False, default=0)


def pack_audio_data(providers, shard_index=None, shard_count=None,
                    step_ms: int = 10) -> PackedAudioData:
    """Packs raw (augmented) audio pools into chunk-aligned device arrays.

    Every provider must expose ``generate_audio_pool(shard_index,
    shard_count) -> list[np.ndarray]`` of float [-1, 1] or int16 clips
    (ClipsFeatureSet does); precomputed-spectrogram (mmap) providers have no
    raw audio and cannot join this mode.

    ``step_ms`` is the frontend hop (config window_step_ms): chunk rows are
    16*step_ms samples so one row is one feature hop at that step.
    """
    if shard_index is None:
        shard_index = jax.process_index()
    if shard_count is None:
        shard_count = jax.process_count()
    hop = 16 * int(step_ms)
    min_chunks = window_chunks_for_hop(hop)
    chunk_parts, offsets, counts = [], [], []
    p_logit, p_start, p_count, p_label, p_penalty, p_strategy = [], [], [], [], [], []
    chunk_pos = 0
    clip_pos = 0
    for p in providers:
        if not hasattr(p, "generate_audio_pool"):
            raise ValueError(
                f"provider {type(p).__name__} has no raw audio "
                "(generate_audio_pool); raw-audio training requires "
                "clips-type feature sets"
            )
        clips = p.generate_audio_pool(shard_index, shard_count)
        n_clips = 0
        for clip in clips:
            clip = np.asarray(clip)
            if clip.dtype != np.int16:
                clip = np.round(
                    np.clip(clip * 32768.0, -32768.0, 32767.0)
                ).astype(np.int16)
            n = -(-len(clip) // hop)
            if n < min_chunks:
                n = min_chunks
            padded = np.zeros(n * hop, np.int16)
            padded[: len(clip)] = clip
            chunk_parts.append(padded.reshape(n, hop))
            offsets.append(chunk_pos)
            counts.append(n)
            chunk_pos += n
            n_clips += 1
        if n_clips == 0:
            continue
        p_logit.append(np.log(p.sampling_weight) if p.sampling_weight > 0 else -1e30)
        p_start.append(clip_pos)
        p_count.append(n_clips)
        p_label.append(p.label)
        p_penalty.append(p.penalty_weight)
        p_strategy.append(_STRATEGY_IDS[p.truncation_strategy])
        clip_pos += n_clips
    if not chunk_parts:
        raise ValueError("no audio clips found in any provider")
    # Edge padding + WIDE_K alignment (see EDGE_PAD note) for the wide-row
    # chunk gather.
    total = sum(p.shape[0] for p in chunk_parts)
    end_pad = EDGE_PAD + (-(EDGE_PAD + total)) % WIDE_K
    chunk_parts = (
        [np.zeros((EDGE_PAD, hop), np.int16)]
        + chunk_parts
        + [np.zeros((end_pad, hop), np.int16)]
    )
    offsets = [o + EDGE_PAD for o in offsets]
    return PackedAudioData(
        edge_pad=EDGE_PAD,
        chunks=jnp.asarray(np.concatenate(chunk_parts, axis=0)),
        clip_offset=jnp.asarray(np.asarray(offsets, np.int32)),
        clip_chunks=jnp.asarray(np.asarray(counts, np.int32)),
        provider_logits=jnp.asarray(np.asarray(p_logit, np.float32)),
        provider_clip_start=jnp.asarray(np.asarray(p_start, np.int32)),
        provider_clip_count=jnp.asarray(np.asarray(p_count, np.int32)),
        provider_label=jnp.asarray(np.asarray(p_label, np.float32)),
        provider_penalty=jnp.asarray(np.asarray(p_penalty, np.float32)),
        provider_strategy=jnp.asarray(np.asarray(p_strategy, np.int32)),
        hop_samples=hop,
    )


def sample_audio_feature_batch(
    data: PackedAudioData,
    rng: jax.Array,
    batch_size: int,
    features_length: int,
    time_mask_max_size: int = 0,
    time_mask_count: int = 0,
    freq_mask_max_size: int = 0,
    freq_mask_count: int = 0,
    frontend_backend: str = "xla",
    wide_gather: bool = False,
):
    """Draws one training batch from raw audio entirely on device: weighted
    window sampling -> fused frontend (MXU DFT/mel + associative-scan AGC,
    frontend/xla.py) -> SpecAugment.  Returns (features [B, L, 40] f32 in
    [0, 26], labels [B], weights [B]).

    ``wide_gather`` (edge-padded corpora only): gather pairs of hop chunks
    (640-sample = 1280 B rows) + a 2-way parity select instead of single
    hop rows -- same mechanism as the spectrogram path's wide gather
    (sample_batch), same bit-identical features.

    The frontend runs on the sampled window only, so the AGC noise estimate
    starts fresh at the window start (the reference's on-the-fly mode
    computes features for the whole augmented clip before truncating --
    data.py:324-402; the boundary difference is a few initial frames of
    gain ramp, equivalent to clips recorded from silence).
    """
    from microwakeword_tpu.frontend import xla as F

    r_prov, r_clip, r_win, r_aug = jax.random.split(rng, 4)
    b = batch_size
    hop = data.hop_samples  # static: 16 * window_step_ms
    wc = window_chunks_for_hop(hop)
    # window of L frames needs L + (wc - 1) hop chunks
    n_chunks = features_length + wc - 1

    prov = jax.random.categorical(r_prov, data.provider_logits, shape=(b,))
    u_clip = jax.random.uniform(r_clip, (b,))
    count = data.provider_clip_count[prov]
    clip = data.provider_clip_start[prov] + jnp.minimum(
        jnp.floor(u_clip * count).astype(jnp.int32), count - 1
    )
    n = data.clip_chunks[clip]
    off = data.clip_offset[clip]

    strategy = data.provider_strategy[prov]
    u_win = jax.random.uniform(r_win, (b,))
    start_random = jnp.floor(u_win * jnp.maximum(n - n_chunks, 1)).astype(jnp.int32)
    start_tstart = n - n_chunks
    start_tend = jnp.zeros_like(n)
    start_long = jnp.select(
        [strategy == TRUNCATE_START, strategy == TRUNCATE_END],
        [start_tstart, start_tend],
        start_random,
    )
    # Short clips: right-align with leading silence (start may be negative).
    start = jnp.where(n > n_chunks, start_long, n - n_chunks)

    k = 2  # wide chunk rows: 2 hops = 640 samples (1280 B) per gathered row
    if wide_gather and data.edge_pad and data.chunks.shape[0] % k == 0:
        rel = start[:, None] + jnp.arange(n_chunks)[None, :]
        valid = (rel >= 0) & (rel < n[:, None])
        g0 = off + start
        wide = data.chunks.reshape(-1, hop * k)
        pr = g0 // k
        nwide = (n_chunks + 2 * k - 2) // k + 1
        wrows = jnp.clip(
            pr[:, None] + jnp.arange(nwide)[None, :], 0, wide.shape[0] - 1
        )
        ww = jnp.take(wide, wrows, axis=0).reshape(b, nwide * k, hop)
        par = (g0 % k).astype(jnp.int32)
        chunks = ww[:, 0:n_chunks]
        for j in range(1, k):
            chunks = jnp.where(
                (par == j)[:, None, None], ww[:, j : j + n_chunks], chunks
            )
    else:
        chunks, valid = gather_windows(data.chunks, off, n, start, n_chunks)
    chunks = chunks.astype(jnp.float32) * valid[:, :, None]  # [B, C, hop]

    if frontend_backend == "pallas":
        # Fused Pallas kernel: frames/DFT/mel/AGC stay in VMEM tiles (no
        # HBM intermediates); the gathered windows go in as flat PCM.
        # (Measured slower than the XLA path on v5e at L=194 -- tile
        # padding waste -- but kept as an option; interpreted off-TPU.)
        from microwakeword_tpu.frontend import pallas as FP

        # chunks hold int16-valued floats; cast back so the wrapper doesn't
        # apply its float-in-[-1,1] x32768 convention.
        feats = FP.frontend_batch(
            chunks.reshape(b, n_chunks * hop).astype(jnp.int16),
            step_ms=hop // 16,
            interpret=jax.default_backend() != "tpu",
        )  # [B, L, 40]
    else:
        # Frame assembly from hop chunks (frontend/xla.py frame_audio logic
        # on pre-chunked rows): frame t = rows t..t+wc-1 flattened, first
        # 480 samples (exact at the 10 ms hop; 640->480 at the 20 ms hop).
        frames = jnp.concatenate(
            [chunks[:, j : features_length + j, :] for j in range(wc)],
            axis=-1,
        )[..., :WINDOW_SAMPLES]  # [B, L, 480]
        sf = F.scaled_filterbank(frames)
        est0 = jnp.zeros(sf.shape[:-2] + (sf.shape[-1],), jnp.float32)
        feats, _ = F.frontend_streaming(sf, est0, axis=-2)  # [B, L, 40]

    if time_mask_count or freq_mask_count:
        feats = apply_spec_augment(
            r_aug,
            feats,
            time_mask_max_size,
            time_mask_count,
            freq_mask_max_size,
            freq_mask_count,
        )
    labels = data.provider_label[prov]
    weights = data.provider_penalty[prov]
    return feats, labels, weights


@flax.struct.dataclass
class PackedMixedData:
    """Mixed-provider raw-audio training corpus: clips-type providers as raw
    audio (in-step frontend) + mmap providers as precomputed spectrograms,
    in ONE jitted step (reference FeatureHandler mixes provider types freely
    per sample, data.py:405-466).

    The batch is split into two statically-sized sub-batches in proportion
    to the provider classes' total sampling weight (``audio_fraction``), and
    providers are drawn class-conditionally within each sub-batch: each
    sample's marginal provider distribution matches the reference's
    independent per-sample draw in expectation, with lower batch-composition
    variance (the split is the binomial mean instead of a binomial draw).
    """

    audio: PackedAudioData
    spec: PackedTrainingData
    audio_fraction: float = flax.struct.field(pytree_node=False, default=0.5)


def pack_mixed_data(providers, shard_index=None, shard_count=None,
                    step_ms: int = 10):
    """Packs a mixed provider list for raw-audio training.

    - all providers clips-type -> PackedAudioData (pure fused-audio path)
    - mixed                    -> PackedMixedData
    - all mmap                 -> PackedTrainingData (plain spectrogram path)

    ``step_ms`` (config window_step_ms) sets the raw-audio chunk hop so the
    in-step frontend computes features at the configured step.
    """
    audio_p = [p for p in providers if hasattr(p, "generate_audio_pool")]
    # mmap providers that hold no training clips (validation/testing-only
    # feature dirs) contribute nothing to the training corpus
    spec_p = [
        p
        for p in providers
        if not hasattr(p, "generate_audio_pool")
        and any(len(s) for s in (p.stores or {}).get("training", []))
    ]
    if not spec_p:
        return pack_audio_data(audio_p, shard_index, shard_count, step_ms)
    if not audio_p:
        return pack_training_data(providers, shard_index, shard_count)
    w_audio = sum(p.sampling_weight for p in audio_p)
    w_spec = sum(p.sampling_weight for p in spec_p)
    return PackedMixedData(
        audio=pack_audio_data(audio_p, shard_index, shard_count, step_ms),
        spec=pack_training_data(spec_p, shard_index, shard_count),
        audio_fraction=float(w_audio / max(w_audio + w_spec, 1e-12)),
    )


def sample_mixed_batch(
    data: PackedMixedData,
    rng: jax.Array,
    batch_size: int,
    features_length: int,
    time_mask_max_size: int = 0,
    time_mask_count: int = 0,
    freq_mask_max_size: int = 0,
    freq_mask_count: int = 0,
    frontend_backend: str = "xla",
):
    """One mixed batch on device: raw-audio sub-batch (windows -> in-step
    frontend) concatenated with a precomputed-spectrogram sub-batch.
    Sub-batch sizes are static (jit-time), proportional to provider weights.
    """
    b_audio = int(round(batch_size * data.audio_fraction))
    b_audio = max(1, min(batch_size - 1, b_audio))
    r_audio, r_spec = jax.random.split(rng)
    fa, la, wa = sample_audio_feature_batch(
        data.audio, r_audio, b_audio, features_length,
        time_mask_max_size=time_mask_max_size,
        time_mask_count=time_mask_count,
        freq_mask_max_size=freq_mask_max_size,
        freq_mask_count=freq_mask_count,
        frontend_backend=frontend_backend,
    )
    fs, ls, ws = sample_batch(
        data.spec, r_spec, batch_size - b_audio, features_length,
        time_mask_max_size=time_mask_max_size,
        time_mask_count=time_mask_count,
        freq_mask_max_size=freq_mask_max_size,
        freq_mask_count=freq_mask_count,
    )
    return (
        jnp.concatenate([fa, fs], axis=0),
        jnp.concatenate([la, ls], axis=0),
        jnp.concatenate([wa, ws], axis=0),
    )


def _draw_windows(
    data: PackedTrainingData,
    rng: jax.Array,
    batch_size: int,
    features_length: int,
):
    """Shared sampling draw: weighted provider choice, uniform clip, window
    start per truncation strategy.  Returns (off [B], n [B], start [B],
    labels [B], weights [B]); uses the first four of the step rng's five
    splits (the fifth is SpecAugment's, finish_batch)."""
    r_prov, r_clip, r_win, r_cut, _ = jax.random.split(rng, 5)
    b, length = batch_size, features_length

    # 1. Weighted provider choice (reference random.choices w/ sampling_weight).
    prov = jax.random.categorical(r_prov, data.provider_logits, shape=(b,))
    # 2. Uniform clip within provider.
    u_clip = jax.random.uniform(r_clip, (b,))
    count = data.provider_clip_count[prov]
    clip = data.provider_clip_start[prov] + jnp.minimum(
        jnp.floor(u_clip * count).astype(jnp.int32), count - 1
    )
    n = data.clip_length[clip]
    off = data.clip_offset[clip]

    # 3. Window start per provider truncation strategy.
    strategy = data.provider_strategy[prov]
    u_win = jax.random.uniform(r_win, (b,))
    # random: randint(0, n - L) (high-exclusive; n > L guaranteed in branch)
    start_random = jnp.floor(u_win * jnp.maximum(n - length, 1)).astype(jnp.int32)
    start_tstart = n - length
    start_tend = jnp.zeros_like(n)
    ncut = data.provider_n_cutoffs[prov]
    cut_idx = jnp.minimum(
        jnp.floor(jax.random.uniform(r_cut, (b,)) * ncut).astype(jnp.int32), ncut - 1
    )
    cutoff = data.provider_cutoffs[prov, cut_idx]
    start_cutoff = n - length - cutoff
    start_long = jnp.select(
        [
            strategy == RANDOM,
            strategy == TRUNCATE_START,
            strategy == TRUNCATE_END,
            strategy == FIXED_RIGHT_CUTOFF,
        ],
        [start_random, start_tstart, start_tend, start_cutoff],
    )
    # Short clips: right-align with left zero padding (start may be negative).
    start = jnp.where(n > length, start_long, n - length)
    labels = data.provider_label[prov]
    weights = data.provider_penalty[prov]
    return off, n, start, labels, weights


def sample_batch_indices(
    data: PackedTrainingData,
    rng: jax.Array,
    batch_size: int,
    features_length: int,
):
    """The index-computation half of sample_batch: draws providers, clips
    and window starts, returning (rows [B, L] int32 into data.frames,
    valid [B, L] bool, labels [B], weights [B]) -- everything EXCEPT the
    frame gather and SpecAugment.

    Uses the first four of sample_batch's five rng splits, so for a given
    step rng the indices here are bit-identical to what sample_batch
    gathers: the host-streaming corpus mode (corpus larger than HBM) runs
    this small function on device over the metadata tables, pulls the rows
    to the host, gathers windows from the host-resident corpus, and feeds
    them to the train step -- same batches as the HBM-resident path.
    """
    off, n, start, labels, weights = _draw_windows(
        data, rng, batch_size, features_length
    )
    length = features_length
    rel = start[:, None] + jnp.arange(length)[None, :]  # [B, L]
    valid = (rel >= 0) & (rel < n[:, None])
    rows = off[:, None] + jnp.clip(rel, 0, (n - 1)[:, None])
    return rows.astype(jnp.int32), valid, labels, weights


def finish_batch(
    rng: jax.Array,
    windows: jnp.ndarray,
    valid: jnp.ndarray,
    time_mask_max_size: int = 0,
    time_mask_count: int = 0,
    freq_mask_max_size: int = 0,
    freq_mask_count: int = 0,
) -> jnp.ndarray:
    """Scaling + SpecAugment on gathered uint16 windows; ``rng`` is the SAME
    step rng passed to sample_batch (the fifth split is the augment key), so
    host-gathered and device-gathered batches are bit-identical."""
    r_aug = jax.random.split(rng, 5)[4]
    feats = windows.astype(jnp.float32) * valid[:, :, None] * FEATURE_SCALE
    if time_mask_count or freq_mask_count:
        feats = apply_spec_augment(
            r_aug,
            feats,
            time_mask_max_size,
            time_mask_count,
            freq_mask_max_size,
            freq_mask_count,
        )
    return feats


def sample_batch(
    data: PackedTrainingData,
    rng: jax.Array,
    batch_size: int,
    features_length: int,
    time_mask_max_size: int = 0,
    time_mask_count: int = 0,
    freq_mask_max_size: int = 0,
    freq_mask_count: int = 0,
    wide_gather: bool = False,
):
    """Draws one training batch entirely on device: weighted provider/clip/
    window choice (_draw_windows), the frame gather, then scaling +
    SpecAugment (finish_batch).

    With ``wide_gather`` (and a corpus packed by pack_training_arrays --
    edge-padded, WIDE_K-aligned) the gather takes the wide-row path: rows
    of WIDE_K frames are gathered from the same buffer reinterpreted
    [total/K, 40*K], then a K-way masked select realigns the per-sample
    start parity.  Values at out-of-window positions differ from the
    per-frame-row path (neighbor frames instead of clamped edge rows) but
    both are zeroed by the valid mask, so the returned features are
    identical (tests/test_data.py).  Measured on a v5e: ~2x faster for the
    private-batch population step (208k gathered rows/step) and ~2% SLOWER
    for the solo 128-batch step (26k rows -- the select tax cancels the
    row savings), hence opt-in per call site rather than automatic.

    Returns (features [B, L, F] f32 in [0,26], labels [B], weights [B]).
    """
    off, n, start, labels, weights = _draw_windows(
        data, rng, batch_size, features_length
    )
    length = features_length
    rel = start[:, None] + jnp.arange(length)[None, :]  # [B, L]
    valid = (rel >= 0) & (rel < n[:, None])
    k = WIDE_K
    if wide_gather and data.edge_pad and data.frames.shape[0] % k == 0:
        g0 = off + start  # window's global start frame (may point into pad)
        width = data.frames.shape[1]
        wide = data.frames.reshape(-1, width * k)
        pr = g0 // k
        nwide = (length + 2 * k - 2) // k + 1  # covers any parity shift
        wrows = jnp.clip(
            pr[:, None] + jnp.arange(nwide)[None, :], 0, wide.shape[0] - 1
        )
        ww = jnp.take(wide, wrows, axis=0).reshape(
            batch_size, nwide * k, width
        )
        par = (g0 % k).astype(jnp.int32)
        windows = ww[:, 0:length]
        for j in range(1, k):
            windows = jnp.where(
                (par == j)[:, None, None], ww[:, j : j + length], windows
            )
    else:
        rows = off[:, None] + jnp.clip(rel, 0, (n - 1)[:, None])
        windows = jnp.take(data.frames, rows, axis=0)
    feats = finish_batch(
        rng,
        windows,
        valid,
        time_mask_max_size=time_mask_max_size,
        time_mask_count=time_mask_count,
        freq_mask_max_size=freq_mask_max_size,
        freq_mask_count=freq_mask_count,
    )
    return feats, labels, weights
