/* mini-htslib shim: VCF structures + entry points used by the reference.
 * See hts.h for scope/provenance notes. Semantics follow the public VCF 4.x
 * spec and htslib's documented GT byte encoding ((allele+1)<<1 | phased,
 * missing allele -> 0, int8 vector-end sentinel 0x81); layouts are our own.
 *
 * Surface covered (everything /root/reference touches):
 *   bcf_hdr_read/bcf_hdr_destroy/bcf_hdr_format/bcf_hdr_nsamples,
 *   bcf_init/bcf_destroy/bcf_read/bcf_unpack,
 *   bcf_hdr_t{n,id,hrec,nhrec,samples}, bcf_hrec_t, bcf_idpair_t/bcf_idinfo_t,
 *   bcf1_t{rid,pos,n_allele,n_fmt,n_sample,errcode,d.allele,d.fmt},
 *   bcf_fmt_t{id,n,size,p,p_len}, BCF_DT_ / BCF_HL_ / BCF_UN_ constants.
 */
#ifndef MINI_VCF_H_
#define MINI_VCF_H_

#include <stdint.h>
#include "hts.h"
#include "kstring.h"

#ifdef __cplusplus
extern "C" {
#endif

/* Dictionary types (indices into bcf_hdr_t::n / ::id). */
#define BCF_DT_ID     0
#define BCF_DT_CTG    1
#define BCF_DT_SAMPLE 2

/* Header-line types. */
#define BCF_HL_FLT  0
#define BCF_HL_INFO 1
#define BCF_HL_FMT  2
#define BCF_HL_CTG  3
#define BCF_HL_STR  4  /* structured ##KEY=<...> */
#define BCF_HL_GEN  5  /* generic  ##KEY=value  */

/* Unpack levels (parsing is eager here, so these are accepted no-ops). */
#define BCF_UN_STR  1
#define BCF_UN_FLT  2
#define BCF_UN_INFO 4
#define BCF_UN_SHR  (BCF_UN_STR | BCF_UN_FLT | BCF_UN_INFO)
#define BCF_UN_FMT  8
#define BCF_UN_IND  BCF_UN_FMT
#define BCF_UN_ALL  (BCF_UN_SHR | BCF_UN_FMT)

typedef struct bcf_hrec_t {
    int type;        /* BCF_HL_* */
    char *key;       /* "INFO", "contig", "fileformat", ... */
    char *value;     /* set for generic lines only */
    int nkeys;
    char **keys;
    char **vals;
} bcf_hrec_t;

typedef struct bcf_idinfo_t {
    uint64_t info[3];     /* for contigs: info[0] = length */
    bcf_hrec_t *hrec[3];
    int id;
} bcf_idinfo_t;

typedef struct bcf_idpair_t {
    const char *key;
    bcf_idinfo_t *val;
} bcf_idpair_t;

typedef struct bcf_hdr_t {
    int32_t n[3];          /* n[BCF_DT_ID], n[BCF_DT_CTG], n[BCF_DT_SAMPLE] */
    bcf_idpair_t *id[3];
    bcf_hrec_t **hrec;
    int nhrec;
    char **samples;
    void *impl;            /* opaque: parse state (literal text, dicts) */
} bcf_hdr_t;

#define bcf_hdr_nsamples(hdr) ((hdr)->n[BCF_DT_SAMPLE])

typedef struct bcf_fmt_t {
    int id;          /* dictionary id of the FORMAT key (shared BCF_DT_ID) */
    int n;           /* values per sample (ploidy for GT) */
    int size;        /* bytes per sample = n * sizeof(elem) */
    int type;        /* elem type; GT here is always int8 */
    uint8_t *p;      /* n_sample * size bytes */
    int p_len;       /* total length of p in elements */
} bcf_fmt_t;

typedef struct bcf_dec_t {
    char **allele;   /* n_allele pointers: [0]=REF, [1..]=ALT */
    bcf_fmt_t *fmt;  /* only fmt[0] (=first FORMAT key) is populated */
} bcf_dec_t;

typedef struct bcf1_t {
    int32_t rid;
    int64_t pos;       /* 0-based */
    int32_t n_allele;
    int32_t n_fmt;
    int32_t n_sample;
    int errcode;
    bcf_dec_t d;
    void *impl;        /* opaque: owned string/GT buffers */
} bcf1_t;

bcf_hdr_t *bcf_hdr_read(htsFile *fp);
void bcf_hdr_destroy(bcf_hdr_t *hdr);
/* Writes the ##-header text (no #CHROM line truncation — caller truncates). */
int bcf_hdr_format(const bcf_hdr_t *hdr, int is_bcf, kstring_t *str);

bcf1_t *bcf_init(void);
void bcf_destroy(bcf1_t *rec);
/* Returns 0 on success, -1 on EOF or error (errcode set on parse error). */
int bcf_read(htsFile *fp, const bcf_hdr_t *hdr, bcf1_t *rec);
int bcf_unpack(bcf1_t *rec, int which);

#ifdef __cplusplus
}
#endif

#endif /* MINI_VCF_H_ */
