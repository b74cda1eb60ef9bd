/* Fast SMS triplet-format tokenizer.
 *
 * Native replacement for the reference's mmap + hand-rolled integer parser
 * (src/SpaSM.jl:1044-1086 "much faster than parse") and the role of
 * spasm_triplet_load in spasm_io.c.  Parses the whole buffer in one pass:
 *
 *   <n> <m> M\n  (the field marker token is skipped, like the reference)
 *   <i> <j> <v>\n ...
 *   0 0 0\n      (terminator; optional)
 *
 * Returns the number of (i, j, v) triples written, or -1 on malformed
 * input / capacity overflow.  header receives {n, m}.  Values may be any
 * 64-bit integers (mod reduction happens on the Python side).
 */

#include <stdint.h>
#include <stddef.h>

static const char *skip_to_int(const char *p, const char *end, int *neg) {
    *neg = 0;
    while (p < end) {
        char c = *p;
        if (c >= '0' && c <= '9') return p;
        if (c == '-') {
            *neg = !*neg;
        } else if (c != ' ' && c != '\t' && c != '\n' && c != '\r' &&
                   c != '+' && c != 'M') {
            /* unexpected token character: tolerate (reference skips the
               field marker silently); treat as separator */
        }
        p++;
    }
    return p;
}

static const char *read_int(const char *p, const char *end, int64_t *out,
                            int *ok) {
    int neg;
    p = skip_to_int(p, end, &neg);
    if (p >= end) {
        *ok = 0;
        return p;
    }
    int64_t v = 0;
    while (p < end && *p >= '0' && *p <= '9') {
        v = v * 10 + (*p - '0');
        p++;
    }
    *out = neg ? -v : v;
    *ok = 1;
    return p;
}

int64_t spasm_tpu_parse_sms(const char *buf, int64_t len, int64_t *header,
                            int64_t *out, int64_t cap) {
    const char *p = buf;
    const char *end = buf + len;
    int ok;
    int64_t n, m;
    p = read_int(p, end, &n, &ok);
    if (!ok) return -1;
    p = read_int(p, end, &m, &ok);
    if (!ok) return -1;
    header[0] = n;
    header[1] = m;
    int64_t count = 0;
    for (;;) {
        int64_t i, j, v;
        p = read_int(p, end, &i, &ok);
        if (!ok) break; /* EOF without terminator: tolerated */
        p = read_int(p, end, &j, &ok);
        if (!ok) return -1;
        p = read_int(p, end, &v, &ok);
        if (!ok) return -1;
        if (i == 0 && j == 0 && v == 0) break;
        if (count >= cap) return -1;
        out[3 * count] = i;
        out[3 * count + 1] = j;
        out[3 * count + 2] = v;
        count++;
    }
    return count;
}
