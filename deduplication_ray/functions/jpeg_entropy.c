/* Baseline-JPEG entropy decode for ONE restart chunk — the hot loop of
 * deduplication_ray/functions/jpeg.py, compiled on hosts that have a C
 * compiler (loaded via ctypes; the pure-Python loop remains the always-
 * available fallback and the reference semantics).
 *
 * Contract mirrors the Python loop exactly (same LUT format: 2^16 entries
 * of (length << 16) | symbol; pad with 1-bits past the end; EXTEND per
 * T.81 F.2.2.1). Returns 0 on success, -1 bad DC code, -2 bad AC code,
 * -3 AC index overflow, -4 corrupt DC magnitude category (> 15 — the
 * Python fallback rejects the same symbols, keeping the two paths
 * divergence-free on malformed input; AC sizes are <= 15 by construction).
 */
#include <stdint.h>

int decode_scan(const unsigned char *data, long dlen,
                const uint32_t *const *dc_luts, const uint32_t *const *ac_luts,
                int ncomp, const int *blocks_per_mcu,
                int32_t *const *coef, long *bidx, int32_t *pred,
                long n_mcus)
{
    uint32_t acc = 0;
    int nbits = 0;
    long pos = 0;

#define FILL(need)                                                        \
    while (nbits < (need)) {                                              \
        acc = ((acc << 8) | (pos < dlen ? data[pos] : 0xFFu));            \
        pos++;                                                            \
        nbits += 8;                                                       \
    }

    for (long mcu = 0; mcu < n_mcus; mcu++) {
        for (int ci = 0; ci < ncomp; ci++) {
            const uint32_t *dc_lut = dc_luts[ci];
            const uint32_t *ac_lut = ac_luts[ci];
            for (int blk = 0; blk < blocks_per_mcu[ci]; blk++) {
                int32_t *row = coef[ci] + bidx[ci] * 64;
                uint32_t e, ln, sym;
                /* DC */
                FILL(16);
                e = dc_lut[(acc >> (nbits - 16)) & 0xFFFFu];
                ln = e >> 16;
                if (ln == 0)
                    return -1;
                sym = e & 0xFFFFu;
                if (sym > 15)
                    return -4; /* corrupt DC category: shift would be UB */
                nbits -= (int)ln;
                acc &= (1u << nbits) - 1u;
                int32_t diff = 0;
                if (sym) {
                    FILL((int)sym);
                    uint32_t v = (acc >> (nbits - (int)sym))
                                 & ((1u << sym) - 1u);
                    nbits -= (int)sym;
                    acc &= (1u << nbits) - 1u;
                    diff = (v >= (1u << (sym - 1)))
                               ? (int32_t)v
                               : (int32_t)v - (int32_t)(1u << sym) + 1;
                }
                pred[ci] += diff;
                row[0] = pred[ci];
                /* AC */
                int k = 1;
                while (k < 64) {
                    FILL(16);
                    e = ac_lut[(acc >> (nbits - 16)) & 0xFFFFu];
                    ln = e >> 16;
                    if (ln == 0)
                        return -2;
                    sym = e & 0xFFFFu;
                    nbits -= (int)ln;
                    acc &= (1u << nbits) - 1u;
                    unsigned size = sym & 0x0Fu;
                    if (size == 0) {
                        if ((sym >> 4) == 15) { /* ZRL */
                            k += 16;
                            continue;
                        }
                        break; /* EOB */
                    }
                    k += (int)(sym >> 4);
                    if (k > 63)
                        return -3;
                    FILL((int)size);
                    uint32_t v = (acc >> (nbits - (int)size))
                                 & ((1u << size) - 1u);
                    nbits -= (int)size;
                    acc &= (1u << nbits) - 1u;
                    row[k] = (v >= (1u << (size - 1)))
                                 ? (int32_t)v
                                 : (int32_t)v - (int32_t)(1u << size) + 1;
                    k++;
                }
                bidx[ci]++;
            }
        }
    }
    return 0;
#undef FILL
}
