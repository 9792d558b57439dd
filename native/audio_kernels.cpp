// Native data-path kernels for the host input pipeline.
//
// The reference delegates its hot host-side audio ops to torchaudio's C++
// (decode, resample, loudness). This library provides the same primitives
// for the TPU input pipeline, loaded via ctypes (see
// stable_audio_tools_tpu/data/native.py): PCM decode (16/24/32-bit + f32),
// polyphase FIR resampling, and BS.1770 K-weighted loudness.
//
// Build: make -C native  (g++ -O3 -march=native -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <vector>

extern "C" {

// ---- PCM decoding ---------------------------------------------------------

void decode_pcm16(const int16_t* in, int64_t n, float* out) {
    constexpr float s = 1.0f / 32768.0f;
    for (int64_t i = 0; i < n; ++i) out[i] = in[i] * s;
}

void decode_pcm24(const uint8_t* in, int64_t n_samples, float* out) {
    constexpr float s = 1.0f / 8388608.0f;  // 2^23
    for (int64_t i = 0; i < n_samples; ++i) {
        int32_t v = (int32_t)in[3 * i] | ((int32_t)in[3 * i + 1] << 8) |
                    ((int32_t)in[3 * i + 2] << 16);
        if (v >= (1 << 23)) v -= (1 << 24);
        out[i] = v * s;
    }
}

void decode_pcm32(const int32_t* in, int64_t n, float* out) {
    constexpr double s = 1.0 / 2147483648.0;  // 2^31
    for (int64_t i = 0; i < n; ++i) out[i] = (float)(in[i] * s);
}

// deinterleave [T, C] -> [C, T]
void deinterleave(const float* in, int64_t frames, int channels, float* out) {
    for (int c = 0; c < channels; ++c) {
        for (int64_t t = 0; t < frames; ++t) {
            out[(int64_t)c * frames + t] = in[t * channels + c];
        }
    }
}

// ---- polyphase FIR resampling ---------------------------------------------
//
// y[m] = sum_k h[k] * x_up[m*down - k], x_up = x zero-stuffed by `up`.
// Equivalent to scipy.signal.resample_poly with the same filter.

void resample_poly_f32(const float* x, int64_t n_in, int up, int down,
                       const float* h, int n_taps, float* y, int64_t n_out) {
    // output m corresponds to position p = m*down in the upsampled signal.
    // x_up[j] = x[j/up] when j % up == 0. h is centered at (n_taps-1)/2.
    const int64_t h_center = (n_taps - 1) / 2;
    for (int64_t m = 0; m < n_out; ++m) {
        const int64_t p = m * (int64_t)down;
        double acc = 0.0;
        // j = p + h_center - k must satisfy j % up == 0 and 0 <= j/up < n_in
        // iterate over valid input samples i = j / up
        int64_t j_max = p + h_center;
        int64_t i_hi = j_max / up;
        if (i_hi >= n_in) i_hi = n_in - 1;
        int64_t j_min = p + h_center - (n_taps - 1);
        int64_t i_lo = (j_min + up - 1) / up;  // ceil
        if (i_lo < 0) i_lo = 0;
        for (int64_t i = i_lo; i <= i_hi; ++i) {
            const int64_t k = p + h_center - i * (int64_t)up;
            acc += (double)h[k] * (double)x[i];
        }
        y[m] = (float)(acc * up);
    }
}

// ---- BS.1770 K-weighted loudness -------------------------------------------

static void biquad(const float* x, float* y, int64_t n, const double b[3],
                   const double a[3]) {
    double x1 = 0, x2 = 0, y1 = 0, y2 = 0;
    for (int64_t i = 0; i < n; ++i) {
        double out = b[0] * x[i] + b[1] * x1 + b[2] * x2 - a[1] * y1 - a[2] * y2;
        x2 = x1; x1 = x[i];
        y2 = y1; y1 = out;
        y[i] = (float)out;
    }
}

// integrated loudness over [C, T] (no gating; matches data/utils.py python path)
double lufs_integrated(const float* audio, int channels, int64_t frames,
                       int sample_rate) {
    // K-weighting filter design (shelf + highpass), bilinear transform
    const double pi = 3.14159265358979323846;
    // shelf
    double f0 = 1681.974450955533, G = 3.999843853973347, Q = 0.7071752369554196;
    double K = tan(pi * f0 / sample_rate);
    double Vh = pow(10.0, G / 20.0);
    double Vb = pow(Vh, 0.4996667741545416);
    double a0 = 1.0 + K / Q + K * K;
    double bs[3] = {(Vh + Vb * K / Q + K * K) / a0, 2.0 * (K * K - Vh) / a0,
                    (Vh - Vb * K / Q + K * K) / a0};
    double as_[3] = {1.0, 2.0 * (K * K - 1.0) / a0, (1.0 - K / Q + K * K) / a0};
    // highpass
    f0 = 38.13547087602444; Q = 0.5003270373238773;
    K = tan(pi * f0 / sample_rate);
    double den = 1.0 + K / Q + K * K;
    double bh[3] = {1.0 / den, -2.0 / den, 1.0 / den};
    double ah[3] = {1.0, 2.0 * (K * K - 1.0) / den, (1.0 - K / Q + K * K) / den};

    std::vector<float> tmp(frames), tmp2(frames);
    double power = 0.0;
    for (int c = 0; c < channels; ++c) {
        biquad(audio + (int64_t)c * frames, tmp.data(), frames, bs, as_);
        biquad(tmp.data(), tmp2.data(), frames, bh, ah);
        double acc = 0.0;
        for (int64_t i = 0; i < frames; ++i)
            acc += (double)tmp2[i] * (double)tmp2[i];
        power += acc / frames;
    }
    return -0.691 + 10.0 * log10(power + 1e-12);
}

}  // extern "C"
