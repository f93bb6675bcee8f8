// Native corpus packer: ragged strings -> padded fixed-width unit matrices.
//
// The runtime analog of a framework data loader. The Python/NumPy packer
// (corpus.py) spends its time in fancy-indexing scatters; this is a single
// linear pass with memcpy, parallelized over rows with OpenMP. Loaded via
// ctypes (no Python C API: inputs are plain buffers prepared by the Python
// side — a joined byte/UTF-32 buffer plus offset tables).
//
// Semantics contract: frizbee_tpu/corpus.py pack_corpus (the NumPy packer
// stays as the differential-testing fallback; tests assert byte-identical
// outputs).

#include <cstdint>
#include <cstring>

extern "C" {

// ASCII/bytes path: copy each selected row's bytes into a zero-padded
// (nrows, width) int8 matrix.
void pack_rows_u8(const uint8_t* joined, const int64_t* starts,
                  const int64_t* rows, int64_t nrows, int64_t width,
                  int8_t* out) {
#pragma omp parallel for schedule(static)
    for (int64_t r = 0; r < nrows; ++r) {
        int64_t row = rows[r];
        int8_t* dst = out + r * width;
        if (row < 0) {  // size-class padding row
            std::memset(dst, 0, (size_t)width);
            continue;
        }
        int64_t s = starts[row];
        int64_t len = starts[row + 1] - s;
        if (len > width) len = width;
        std::memcpy(dst, joined + s, (size_t)len);
        if (len < width) std::memset(dst + len, 0, (size_t)(width - len));
    }
}

// Unicode path: units are codepoints (from a UTF-32LE buffer). Emits the
// five per-unit arrays the device pipeline needs: codepoint, first UTF-8
// byte, previous unit's last UTF-8 byte (-1 at row start/padding), byte
// offset within the haystack, and UTF-8 byte length.
void pack_rows_u32(const uint32_t* joined, const int64_t* starts,
                   const int64_t* rows, int64_t nrows, int64_t width,
                   int32_t* cp, int32_t* first, int32_t* prev,
                   int32_t* boff, int32_t* blen) {
#pragma omp parallel for schedule(static)
    for (int64_t r = 0; r < nrows; ++r) {
        int64_t row = rows[r];
        int64_t base = r * width;
        int64_t s = 0, len = 0;
        if (row >= 0) {  // row < 0: size-class padding, emit empty
            s = starts[row];
            len = starts[row + 1] - s;
            if (len > width) len = width;
        }
        int32_t off = 0;
        int32_t prevb = -1;
        for (int64_t k = 0; k < len; ++k) {
            uint32_t c = joined[s + k];
            int32_t l, fb, lb;
            if (c < 0x80) {
                l = 1; fb = (int32_t)c; lb = (int32_t)c;
            } else if (c < 0x800) {
                l = 2; fb = 0xC0 | (int32_t)(c >> 6);
                lb = 0x80 | (int32_t)(c & 0x3F);
            } else if (c < 0x10000) {
                l = 3; fb = 0xE0 | (int32_t)(c >> 12);
                lb = 0x80 | (int32_t)(c & 0x3F);
            } else {
                l = 4; fb = 0xF0 | (int32_t)(c >> 18);
                lb = 0x80 | (int32_t)(c & 0x3F);
            }
            cp[base + k] = (int32_t)c;
            first[base + k] = fb;
            prev[base + k] = prevb;
            boff[base + k] = off;
            blen[base + k] = l;
            off += l;
            prevb = lb;
        }
        for (int64_t k = len; k < width; ++k) {
            cp[base + k] = 0;
            first[base + k] = 0;
            prev[base + k] = -1;
            boff[base + k] = 0;
            blen[base + k] = 0;
        }
    }
}

// Per-row UTF-8 byte counts for a UTF-32 buffer.
void utf8_lengths(const uint32_t* joined, const int64_t* starts, int64_t n,
                  int64_t* out) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
        int64_t b = 0;
        for (int64_t k = starts[i]; k < starts[i + 1]; ++k) {
            uint32_t c = joined[k];
            b += c < 0x80 ? 1 : c < 0x800 ? 2 : c < 0x10000 ? 3 : 4;
        }
        out[i] = b;
    }
}

}  // extern "C"
