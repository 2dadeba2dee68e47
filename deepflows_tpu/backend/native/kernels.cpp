// Native CPU kernel library for deepflows_tpu.
//
// TPU-native rebuild's analog of the reference's compiled CUDA extension
// (`DeepFlows/backend/backend_src/ndarray_backend_cuda.cu`, 716 LoC): the
// same kernel surface — fill / elementwise / scalar ops / compare / log /
// exp / tanh / matmul / trailing-axis reductions — implemented as a C
// library for the CPU device path.  The TPU compute path is XLA/Pallas (a
// C++ host extension cannot target the TPU); this module is where native
// code still earns its keep: a fast in-process CPU backend, loaded via
// ctypes (no pybind11 in this image).
//
// Layout contract (mirrors the reference's `.cu` constants at :15-19):
// float32 buffers, contiguous, max 8 dims handled by the Python layer.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

typedef float scalar_t;

void nat_fill(scalar_t* out, scalar_t val, int64_t n) {
    for (int64_t i = 0; i < n; ++i) out[i] = val;
}

#define EWISE_BINOP(name, expr)                                            \
    void name(const scalar_t* a, const scalar_t* b, scalar_t* out,         \
              int64_t n) {                                                 \
        for (int64_t i = 0; i < n; ++i) out[i] = (expr);                   \
    }

EWISE_BINOP(nat_ewise_add, a[i] + b[i])
EWISE_BINOP(nat_ewise_sub, a[i] - b[i])
EWISE_BINOP(nat_ewise_mul, a[i] * b[i])
EWISE_BINOP(nat_ewise_div, a[i] / b[i])
EWISE_BINOP(nat_ewise_maximum, std::max(a[i], b[i]))
EWISE_BINOP(nat_ewise_eq, a[i] == b[i] ? 1.0f : 0.0f)
EWISE_BINOP(nat_ewise_ge, a[i] >= b[i] ? 1.0f : 0.0f)

#define SCALAR_OP(name, expr)                                              \
    void name(const scalar_t* a, scalar_t val, scalar_t* out, int64_t n) { \
        for (int64_t i = 0; i < n; ++i) out[i] = (expr);                   \
    }

SCALAR_OP(nat_scalar_add, a[i] + val)
SCALAR_OP(nat_scalar_mul, a[i] * val)
SCALAR_OP(nat_scalar_div, a[i] / val)
SCALAR_OP(nat_scalar_power, std::pow(a[i], val))
SCALAR_OP(nat_scalar_maximum, std::max(a[i], val))
SCALAR_OP(nat_scalar_eq, a[i] == val ? 1.0f : 0.0f)
SCALAR_OP(nat_scalar_ge, a[i] >= val ? 1.0f : 0.0f)

// ewise_log preserves the reference's -INF-for-nonpositive contract
// (`ndarray_backend_cuda.cu:403-414`)
void nat_ewise_log(const scalar_t* a, scalar_t* out, int64_t n) {
    for (int64_t i = 0; i < n; ++i)
        out[i] = a[i] > 0.0f ? std::log(a[i]) : -INFINITY;
}

void nat_ewise_exp(const scalar_t* a, scalar_t* out, int64_t n) {
    for (int64_t i = 0; i < n; ++i) out[i] = std::exp(a[i]);
}

void nat_ewise_tanh(const scalar_t* a, scalar_t* out, int64_t n) {
    for (int64_t i = 0; i < n; ++i) out[i] = std::tanh(a[i]);
}

// Cache-blocked SGEMM: out[M,P] = a[M,N] @ b[N,P].  Replaces the
// reference's naive per-output-element kernel (`.cu:443-466`, TILE=4, no
// shared memory) with i-k-j loop order (unit-stride inner loop, FMA
// friendly) and L1-sized blocking.
void nat_matmul(const scalar_t* a, const scalar_t* b, scalar_t* out,
                int64_t M, int64_t N, int64_t P) {
    std::memset(out, 0, sizeof(scalar_t) * M * P);
    const int64_t BM = 64, BN = 256, BP = 512;
    for (int64_t i0 = 0; i0 < M; i0 += BM)
        for (int64_t k0 = 0; k0 < N; k0 += BN)
            for (int64_t j0 = 0; j0 < P; j0 += BP) {
                int64_t i1 = std::min(i0 + BM, M);
                int64_t k1 = std::min(k0 + BN, N);
                int64_t j1 = std::min(j0 + BP, P);
                for (int64_t i = i0; i < i1; ++i) {
                    scalar_t* orow = out + i * P;
                    const scalar_t* arow = a + i * N;
                    for (int64_t k = k0; k < k1; ++k) {
                        scalar_t av = arow[k];
                        const scalar_t* brow = b + k * P;
                        for (int64_t j = j0; j < j1; ++j)
                            orow[j] += av * brow[j];
                    }
                }
            }
}

// Trailing-axis reductions (reference `.cu:469-509`): out[i] reduces
// `reduce_size` contiguous elements.
void nat_reduce_sum(const scalar_t* a, scalar_t* out, int64_t out_n,
                    int64_t reduce_size) {
    for (int64_t i = 0; i < out_n; ++i) {
        scalar_t acc = 0.0f;
        const scalar_t* base = a + i * reduce_size;
        for (int64_t j = 0; j < reduce_size; ++j) acc += base[j];
        out[i] = acc;
    }
}

void nat_reduce_max(const scalar_t* a, scalar_t* out, int64_t out_n,
                    int64_t reduce_size) {
    for (int64_t i = 0; i < out_n; ++i) {
        const scalar_t* base = a + i * reduce_size;
        scalar_t acc = base[0];
        for (int64_t j = 1; j < reduce_size; ++j) acc = std::max(acc, base[j]);
        out[i] = acc;
    }
}

int nat_version() { return 1; }

}  // extern "C"
