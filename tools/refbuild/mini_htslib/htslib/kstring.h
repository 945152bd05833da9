/* mini-htslib shim: kstring_t. See hts.h for scope/provenance notes.
 * The reference only uses the struct fields (l, s) and free()s .s
 * (vcf_reader.h:176-183); no kstring functions are called.
 */
#ifndef MINI_KSTRING_H_
#define MINI_KSTRING_H_

#include <stddef.h>

typedef struct kstring_t {
    size_t l, m;
    char *s;
} kstring_t;

#endif /* MINI_KSTRING_H_ */
