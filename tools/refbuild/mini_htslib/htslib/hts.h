/* mini-htslib: a minimal, from-scratch htslib API shim used ONLY to build
 * the reference tomahawk binary as a cross-validation oracle in tests.
 *
 * This is NOT htslib and NOT derived from htslib source: it implements, from
 * the documented VCF 4.x text format, just the entry points the reference
 * uses (see /root/reference/lib/vcf_reader.h:23-59 and lib/importer.cpp).
 * Since the reference is compiled against THESE headers, the struct layouts
 * here define the ABI — they only need to be self-consistent, not match
 * real htslib.
 *
 * Supported input: plain or gzip-compressed VCF text (via zlib). BCF is not
 * supported (test fixtures use VCF).
 */
#ifndef MINI_HTS_H_
#define MINI_HTS_H_

#ifdef __cplusplus
extern "C" {
#endif

typedef struct htsFile {
    char *fn;    /* file name (reference reads fp->fn in error paths) */
    void *impl;  /* opaque: mini_vcf_file state */
} htsFile;

htsFile *hts_open(const char *fn, const char *mode);
int hts_close(htsFile *fp);
/* Decode-thread pool: a no-op here (single-threaded text parse). */
int hts_set_threads(htsFile *fp, int n);
const char *hts_version(void);

#ifdef __cplusplus
}
#endif

#endif /* MINI_HTS_H_ */
