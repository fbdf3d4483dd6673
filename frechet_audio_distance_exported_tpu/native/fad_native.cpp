// Native host runtime for the TPU FAD framework.
//
// The reference leans on C internals of soundfile/resampy/numba for its host
// data path (SURVEY.md §2); this library is the equivalent for this
// framework: the Kaiser-sinc polyphase resampler inner loop (the exact
// table-interpolation algorithm of ops/resample.py) and PCM decode + channel
// mixdown, both OpenMP-parallel. Loaded via ctypes (native/__init__.py);
// everything has a NumPy fallback, so this is a pure acceleration layer.
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC fad_native.cpp -o fad_native.so

#include <cstdint>
#include <cmath>
#include <cstring>

extern "C" {

// Kaiser-windowed sinc resampling: for each output sample t, accumulate both
// filter wings through the linearly-interpolated half-filter table.
// Mirrors ops/resample.py::_resample_1d (itself resampy-parity).
void resample_kaiser(const double* x, int64_t n_in, int64_t n_out,
                     double sample_ratio, const double* win,
                     const double* delta, int64_t nwin, int64_t num_table,
                     double* y) {
    const double scale = sample_ratio < 1.0 ? sample_ratio : 1.0;
    const int64_t index_step = (int64_t)(scale * (double)num_table);
    const double time_increment = 1.0 / sample_ratio;

#pragma omp parallel for schedule(static)
    for (int64_t t = 0; t < n_out; ++t) {
        const double time_register = (double)t * time_increment;
        const int64_t n = (int64_t)time_register;
        double acc = 0.0;

        // Left wing.
        double frac = scale * (time_register - (double)n);
        double index_frac = frac * (double)num_table;
        int64_t offset = (int64_t)index_frac;
        double eta = index_frac - (double)offset;
        int64_t i_max = n + 1;
        const int64_t left_cap = (nwin - offset) / index_step;
        if (left_cap < i_max) i_max = left_cap;
        for (int64_t i = 0; i < i_max; ++i) {
            const int64_t idx = offset + i * index_step;
            const double weight = win[idx] + eta * delta[idx];
            acc += weight * x[n - i];
        }

        // Right wing.
        frac = scale - frac;
        index_frac = frac * (double)num_table;
        offset = (int64_t)index_frac;
        eta = index_frac - (double)offset;
        int64_t k_max = n_in - n - 1;
        const int64_t right_cap = (nwin - offset) / index_step;
        if (right_cap < k_max) k_max = right_cap;
        for (int64_t k = 0; k < k_max; ++k) {
            const int64_t idx = offset + k * index_step;
            const double weight = win[idx] + eta * delta[idx];
            acc += weight * x[n + k + 1];
        }

        y[t] = acc;
    }
}

// Interleaved int16 PCM -> float32 in [-1, 1), optional channel mean-mix.
// channels == 1 output when mixdown != 0, else interleaved passthrough shape.
void pcm16_to_f32(const int16_t* in, int64_t frames, int32_t channels,
                  int32_t mixdown, float* out) {
    const float inv = 1.0f / 32768.0f;
    if (channels == 1 || !mixdown) {
        const int64_t n = frames * channels;
#pragma omp parallel for schedule(static)
        for (int64_t i = 0; i < n; ++i) out[i] = (float)in[i] * inv;
    } else {
        const float chinv = 1.0f / (float)channels;
#pragma omp parallel for schedule(static)
        for (int64_t f = 0; f < frames; ++f) {
            float acc = 0.0f;
            for (int32_t c = 0; c < channels; ++c)
                acc += (float)in[f * channels + c];
            out[f] = acc * inv * chinv;
        }
    }
}

// Interleaved int32 / 24-bit-in-32 PCM -> float32.
void pcm32_to_f32(const int32_t* in, int64_t frames, int32_t channels,
                  int32_t mixdown, float* out) {
    const double inv = 1.0 / 2147483648.0;
    if (channels == 1 || !mixdown) {
        const int64_t n = frames * channels;
#pragma omp parallel for schedule(static)
        for (int64_t i = 0; i < n; ++i) out[i] = (float)((double)in[i] * inv);
    } else {
        const double chinv = 1.0 / (double)channels;
#pragma omp parallel for schedule(static)
        for (int64_t f = 0; f < frames; ++f) {
            double acc = 0.0;
            for (int32_t c = 0; c < channels; ++c)
                acc += (double)in[f * channels + c];
            out[f] = (float)(acc * inv * chinv);
        }
    }
}

int32_t fad_native_abi_version() { return 1; }

}  // extern "C"
