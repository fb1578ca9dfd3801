// Minimal Fortran-convention ?syrk for linking the reference cores in
// an environment with no system BLAS (only the eALS core calls it, via
// include/buffalo/misc/blas.hpp).  Column-major semantics:
//   trans='N': C := alpha*A*A^T + beta*C, A is n x k (lda >= n)
//   trans='T': C := alpha*A^T*A + beta*C, A is k x n (lda >= k)
// Only the uplo ('U' upper / 'L' lower) triangle of C is updated.
#include <cctype>
#include <cstddef>
using std::size_t;

namespace {
template <typename T>
void syrk_impl(char uplo, char trans, int n, int k, T alpha, const T* A,
               int lda, T beta, T* C, int ldc) {
    const bool up = (uplo == 'U' || uplo == 'u');
    const bool nt = (trans == 'N' || trans == 'n');
    for (int j = 0; j < n; ++j) {
        const int ib = up ? 0 : j;
        const int ie = up ? j + 1 : n;
        for (int i = ib; i < ie; ++i) {
            T acc = 0;
            if (nt) {
                for (int l = 0; l < k; ++l)
                    acc += A[i + (size_t)l * lda] * A[j + (size_t)l * lda];
            } else {
                const T* ai = A + (size_t)i * lda;
                const T* aj = A + (size_t)j * lda;
                for (int l = 0; l < k; ++l) acc += ai[l] * aj[l];
            }
            T& c = C[i + (size_t)j * ldc];
            c = alpha * acc + (beta == T(0) ? T(0) : beta * c);
        }
    }
}
}  // namespace

extern "C" {
void ssyrk_(const char* uplo, const char* trans, const int* n,
            const int* k, const float* alpha, const float* A,
            const int* lda, const float* beta, float* C,
            const int* ldc) {
    syrk_impl(*uplo, *trans, *n, *k, *alpha, A, *lda, *beta, C, *ldc);
}
void dsyrk_(const char* uplo, const char* trans, const int* n,
            const int* k, const double* alpha, const double* A,
            const int* lda, const double* beta, double* C,
            const int* ldc) {
    syrk_impl(*uplo, *trans, *n, *k, *alpha, A, *lda, *beta, C, *ldc);
}
}
