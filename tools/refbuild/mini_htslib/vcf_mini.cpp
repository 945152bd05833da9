/* mini-htslib shim implementation. See htslib/hts.h for scope/provenance.
 *
 * Written from the VCF 4.x text specification; the only htslib-specific
 * behaviors reproduced (because the reference's importer depends on them,
 * /root/reference/lib/genotype_encoder.h:59-115) are:
 *   - GT byte encoding: (allele_index + 1) << 1 | phased; '.' allele -> 0;
 *     the first allele of a call never carries the phase bit.
 *   - Haploid calls padded to the record's max ploidy with the int8
 *     vector-end sentinel 0x81 (INT8_MIN + 1).
 *   - Shared FILTER/INFO/FORMAT id dictionary with "PASS" pre-registered
 *     at id 0; contigs get their own dictionary in order of appearance.
 *   - An IDX key is appended to each FILTER/INFO/FORMAT/contig hrec so the
 *     reference's VcfHeaderInternal (lib/header_internal.cpp) sees explicit
 *     dictionary ids; bcf_hdr_format() skips IDX when printing.
 */
#include "htslib/vcf.h"

#include <zlib.h>

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct MiniFile {
    gzFile gz = nullptr;
    std::string pending;  // lookahead line (header parse reads one too far)
    bool have_pending = false;
    std::string linebuf;

    // Reads one line (without trailing \n / \r\n). Returns false on EOF.
    bool getline(std::string &out) {
        if (have_pending) {
            out = std::move(pending);
            have_pending = false;
            return true;
        }
        out.clear();
        char buf[1 << 16];
        bool got_any = false;
        for (;;) {
            if (gzgets(gz, buf, sizeof(buf)) == nullptr)
                return got_any;
            got_any = true;
            out += buf;
            if (!out.empty() && out.back() == '\n') {
                out.pop_back();
                if (!out.empty() && out.back() == '\r') out.pop_back();
                return true;
            }
        }
    }
};

struct HdrImpl {
    std::string literal;  // all header lines verbatim (## lines + #CHROM)
    std::unordered_map<std::string, int> id_dict;   // shared FLT/INFO/FMT
    std::unordered_map<std::string, int> ctg_dict;  // contigs
    std::vector<std::string> ctg_names;
    std::vector<bcf_idinfo_t *> ctg_infos;
    std::vector<std::string> sample_names;
    std::vector<bcf_hrec_t *> hrecs;
};

struct RecImpl {
    std::vector<std::string> alleles;
    std::vector<char *> allele_ptrs;
    std::vector<uint8_t> gt;
    bcf_fmt_t fmt[1];
    std::vector<char> field;  // scratch
};

char *xstrdup(const std::string &s) {
    char *p = (char *)malloc(s.size() + 1);
    memcpy(p, s.c_str(), s.size() + 1);
    return p;
}

void hrec_add_kv(bcf_hrec_t *h, const std::string &k, const std::string &v) {
    h->keys = (char **)realloc(h->keys, sizeof(char *) * (h->nkeys + 1));
    h->vals = (char **)realloc(h->vals, sizeof(char *) * (h->nkeys + 1));
    h->keys[h->nkeys] = xstrdup(k);
    h->vals[h->nkeys] = xstrdup(v);
    h->nkeys++;
}

const char *hrec_get(const bcf_hrec_t *h, const char *key) {
    for (int i = 0; i < h->nkeys; ++i)
        if (strcmp(h->keys[i], key) == 0) return h->vals[i];
    return nullptr;
}

void hrec_free(bcf_hrec_t *h) {
    free(h->key);
    free(h->value);
    for (int i = 0; i < h->nkeys; ++i) {
        free(h->keys[i]);
        free(h->vals[i]);
    }
    free(h->keys);
    free(h->vals);
    free(h);
}

// Parses the <...> body of a structured header line into key=value pairs.
// Values may be quoted with '"' and contain escaped characters.
bool parse_structured(const std::string &body, bcf_hrec_t *h) {
    size_t i = 0;
    const size_t n = body.size();
    while (i < n) {
        while (i < n && (body[i] == ',' || body[i] == ' ')) ++i;
        if (i >= n) break;
        size_t eq = body.find('=', i);
        if (eq == std::string::npos) return false;
        std::string key = body.substr(i, eq - i);
        i = eq + 1;
        std::string val;
        if (i < n && body[i] == '"') {
            ++i;
            while (i < n && body[i] != '"') {
                if (body[i] == '\\' && i + 1 < n) ++i;
                val += body[i++];
            }
            if (i >= n) return false;  // unterminated quote
            ++i;
        } else {
            size_t end = i;
            while (end < n && body[end] != ',') ++end;
            val = body.substr(i, end - i);
            i = end;
        }
        hrec_add_kv(h, key, val);
    }
    return true;
}

int shared_dict_id(HdrImpl *impl, const std::string &name) {
    auto it = impl->id_dict.find(name);
    if (it != impl->id_dict.end()) return it->second;
    int id = (int)impl->id_dict.size();
    impl->id_dict.emplace(name, id);
    return id;
}

bcf_idinfo_t *add_contig(bcf_hdr_t *hdr, HdrImpl *impl, const std::string &name,
                         uint64_t length, bcf_hrec_t *hrec) {
    auto it = impl->ctg_dict.find(name);
    if (it != impl->ctg_dict.end()) return impl->ctg_infos[it->second];
    int idx = (int)impl->ctg_names.size();
    impl->ctg_dict.emplace(name, idx);
    impl->ctg_names.push_back(name);
    bcf_idinfo_t *info = (bcf_idinfo_t *)calloc(1, sizeof(bcf_idinfo_t));
    info->info[0] = length;
    info->id = idx;
    if (hrec == nullptr) {
        // Synthesize a ##contig hrec for contigs first seen in the body.
        hrec = (bcf_hrec_t *)calloc(1, sizeof(bcf_hrec_t));
        hrec->type = BCF_HL_CTG;
        hrec->key = xstrdup("contig");
        hrec_add_kv(hrec, "ID", name);
        impl->hrecs.push_back(hrec);
    }
    if (hrec_get(hrec, "IDX") == nullptr)
        hrec_add_kv(hrec, "IDX", std::to_string(idx));
    info->hrec[0] = hrec;
    impl->ctg_infos.push_back(info);
    return info;
}

void rebuild_hdr_arrays(bcf_hdr_t *hdr, HdrImpl *impl) {
    free(hdr->hrec);
    hdr->hrec = (bcf_hrec_t **)malloc(sizeof(bcf_hrec_t *) * impl->hrecs.size());
    for (size_t i = 0; i < impl->hrecs.size(); ++i) hdr->hrec[i] = impl->hrecs[i];
    hdr->nhrec = (int)impl->hrecs.size();

    free(hdr->id[BCF_DT_CTG]);
    hdr->id[BCF_DT_CTG] =
        (bcf_idpair_t *)malloc(sizeof(bcf_idpair_t) * impl->ctg_names.size());
    for (size_t i = 0; i < impl->ctg_names.size(); ++i) {
        hdr->id[BCF_DT_CTG][i].key = impl->ctg_names[i].c_str();
        hdr->id[BCF_DT_CTG][i].val = impl->ctg_infos[i];
    }
    hdr->n[BCF_DT_CTG] = (int)impl->ctg_names.size();
    hdr->n[BCF_DT_ID] = (int)impl->id_dict.size();

    free(hdr->samples);
    hdr->samples = (char **)malloc(sizeof(char *) * impl->sample_names.size());
    for (size_t i = 0; i < impl->sample_names.size(); ++i)
        hdr->samples[i] = const_cast<char *>(impl->sample_names[i].c_str());
    hdr->n[BCF_DT_SAMPLE] = (int)impl->sample_names.size();
}

}  // namespace

extern "C" {

htsFile *hts_open(const char *fn, const char *mode) {
    (void)mode;
    gzFile gz = gzopen(fn, "rb");
    if (gz == nullptr) return nullptr;
    htsFile *fp = (htsFile *)calloc(1, sizeof(htsFile));
    fp->fn = xstrdup(fn);
    MiniFile *mf = new MiniFile();
    mf->gz = gz;
    fp->impl = mf;
    return fp;
}

int hts_close(htsFile *fp) {
    if (fp == nullptr) return 0;
    MiniFile *mf = (MiniFile *)fp->impl;
    gzclose(mf->gz);
    delete mf;
    free(fp->fn);
    free(fp);
    return 0;
}

int hts_set_threads(htsFile *fp, int n) {
    (void)fp;
    (void)n;
    return 0;
}

const char *hts_version(void) { return "mini-htslib-shim 1.0 (test oracle)"; }

bcf_hdr_t *bcf_hdr_read(htsFile *fp) {
    MiniFile *mf = (MiniFile *)fp->impl;
    bcf_hdr_t *hdr = (bcf_hdr_t *)calloc(1, sizeof(bcf_hdr_t));
    HdrImpl *impl = new HdrImpl();
    hdr->impl = impl;
    shared_dict_id(impl, "PASS");

    std::string line;
    bool saw_chrom = false;
    while (mf->getline(line)) {
        if (line.rfind("##", 0) == 0) {
            impl->literal += line;
            impl->literal += '\n';
            size_t eq = line.find('=');
            if (eq == std::string::npos) continue;
            std::string key = line.substr(2, eq - 2);
            std::string rest = line.substr(eq + 1);
            bcf_hrec_t *h = (bcf_hrec_t *)calloc(1, sizeof(bcf_hrec_t));
            h->key = xstrdup(key);
            if (!rest.empty() && rest[0] == '<') {
                size_t close = rest.rfind('>');
                std::string body =
                    rest.substr(1, close == std::string::npos ? std::string::npos
                                                              : close - 1);
                if (!parse_structured(body, h)) {
                    hrec_free(h);
                    continue;
                }
                if (key == "FILTER") h->type = BCF_HL_FLT;
                else if (key == "INFO") h->type = BCF_HL_INFO;
                else if (key == "FORMAT") h->type = BCF_HL_FMT;
                else if (key == "contig") h->type = BCF_HL_CTG;
                else h->type = BCF_HL_STR;
                if (h->type == BCF_HL_CTG) {
                    const char *name = hrec_get(h, "ID");
                    const char *len = hrec_get(h, "length");
                    if (name != nullptr)
                        add_contig(hdr, impl, name,
                                   len ? strtoull(len, nullptr, 10) : 0x7fffffffULL,
                                   h);
                } else if (h->type != BCF_HL_STR) {
                    const char *name = hrec_get(h, "ID");
                    if (name != nullptr && hrec_get(h, "IDX") == nullptr)
                        hrec_add_kv(h, "IDX",
                                    std::to_string(shared_dict_id(impl, name)));
                }
            } else {
                h->type = BCF_HL_GEN;
                h->value = xstrdup(rest);
            }
            impl->hrecs.push_back(h);
        } else if (line.rfind("#CHROM", 0) == 0) {
            impl->literal += line;
            impl->literal += '\n';
            // Columns: CHROM POS ID REF ALT QUAL FILTER INFO [FORMAT samples...]
            size_t start = 0;
            int col = 0;
            const std::string l = line + '\t';
            for (size_t i = 0; i < l.size(); ++i) {
                if (l[i] != '\t') continue;
                if (col >= 9)
                    impl->sample_names.push_back(l.substr(start, i - start));
                start = i + 1;
                ++col;
            }
            saw_chrom = true;
            break;
        } else {
            // Data line reached without #CHROM (malformed); push back.
            mf->pending = line;
            mf->have_pending = true;
            break;
        }
    }
    if (impl->hrecs.empty() || !saw_chrom) {
        bcf_hdr_destroy(hdr);
        return nullptr;
    }
    rebuild_hdr_arrays(hdr, impl);
    return hdr;
}

void bcf_hdr_destroy(bcf_hdr_t *hdr) {
    if (hdr == nullptr) return;
    HdrImpl *impl = (HdrImpl *)hdr->impl;
    for (bcf_hrec_t *h : impl->hrecs) hrec_free(h);
    for (bcf_idinfo_t *info : impl->ctg_infos) free(info);
    free(hdr->hrec);
    free(hdr->id[BCF_DT_CTG]);
    free(hdr->samples);
    delete impl;
    free(hdr);
}

int bcf_hdr_format(const bcf_hdr_t *hdr, int is_bcf, kstring_t *str) {
    (void)is_bcf;
    const HdrImpl *impl = (const HdrImpl *)hdr->impl;
    str->l = impl->literal.size();
    str->m = str->l + 1;
    str->s = (char *)malloc(str->m);
    memcpy(str->s, impl->literal.c_str(), str->l + 1);
    return 0;
}

bcf1_t *bcf_init(void) {
    bcf1_t *rec = (bcf1_t *)calloc(1, sizeof(bcf1_t));
    rec->impl = new RecImpl();
    return rec;
}

void bcf_destroy(bcf1_t *rec) {
    if (rec == nullptr) return;
    delete (RecImpl *)rec->impl;
    free(rec);
}

int bcf_unpack(bcf1_t *rec, int which) {
    (void)rec;
    (void)which;
    return 0;  // parsing is eager in bcf_read
}

int bcf_read(htsFile *fp, const bcf_hdr_t *hdr_const, bcf1_t *rec) {
    bcf_hdr_t *hdr = const_cast<bcf_hdr_t *>(hdr_const);
    MiniFile *mf = (MiniFile *)fp->impl;
    HdrImpl *himpl = (HdrImpl *)hdr->impl;
    RecImpl *ri = (RecImpl *)rec->impl;

    std::string &line = mf->linebuf;
    if (!mf->getline(line)) return -1;
    if (line.empty()) return -1;

    // Split into tab-separated fields (views into `line`).
    std::vector<std::pair<size_t, size_t>> cols;
    size_t start = 0;
    for (size_t i = 0; i <= line.size(); ++i) {
        if (i == line.size() || line[i] == '\t') {
            cols.emplace_back(start, i - start);
            start = i + 1;
        }
    }
    if (cols.size() < 8) {
        rec->errcode = 1;
        return -1;
    }
    auto col = [&](int i) { return line.substr(cols[i].first, cols[i].second); };

    // CHROM -> rid (auto-register unseen contigs, as htslib does).
    const std::string chrom = col(0);
    auto it = himpl->ctg_dict.find(chrom);
    if (it == himpl->ctg_dict.end()) {
        add_contig(hdr, himpl, chrom, 0x7fffffffULL, nullptr);
        rebuild_hdr_arrays(hdr, himpl);
        it = himpl->ctg_dict.find(chrom);
    }
    rec->rid = it->second;
    rec->pos = strtoll(col(1).c_str(), nullptr, 10) - 1;

    // REF + ALT alleles. ALT "." means no ALT.
    ri->alleles.clear();
    ri->alleles.push_back(col(3));
    const std::string alt = col(4);
    if (alt != ".") {
        size_t s = 0;
        for (size_t i = 0; i <= alt.size(); ++i) {
            if (i == alt.size() || alt[i] == ',') {
                ri->alleles.push_back(alt.substr(s, i - s));
                s = i + 1;
            }
        }
    }
    rec->n_allele = (int)ri->alleles.size();
    ri->allele_ptrs.clear();
    for (std::string &a : ri->alleles)
        ri->allele_ptrs.push_back(const_cast<char *>(a.c_str()));
    rec->d.allele = ri->allele_ptrs.data();

    rec->n_sample = hdr->n[BCF_DT_SAMPLE];
    rec->n_fmt = 0;
    rec->d.fmt = nullptr;

    if (cols.size() < 10 || rec->n_sample == 0) return 0;  // sites-only VCF

    // FORMAT column: we populate only the first key (the reference only
    // reads d.fmt[0] and requires it to be GT, lib/importer.cpp:139).
    const std::string format = col(8);
    std::string first_key = format.substr(0, format.find(':'));
    int n_keys = 1;
    for (char c : format)
        if (c == ':') ++n_keys;

    if ((int)cols.size() - 9 < rec->n_sample) {
        rec->errcode = 1;
        return -1;
    }

    // First pass: ploidy = max number of alleles in any sample's GT call.
    int max_ploidy = 0;
    std::vector<int> ploidy((size_t)rec->n_sample);
    for (int s = 0; s < rec->n_sample; ++s) {
        const char *p = line.c_str() + cols[9 + s].first;
        const char *end = p + cols[9 + s].second;
        int n_al = (p < end) ? 1 : 0;
        for (const char *q = p; q < end && *q != ':'; ++q)
            if (*q == '/' || *q == '|') ++n_al;
        ploidy[s] = n_al;
        if (n_al > max_ploidy) max_ploidy = n_al;
    }
    if (max_ploidy == 0) max_ploidy = 1;

    ri->gt.assign((size_t)rec->n_sample * max_ploidy, 0);
    for (int s = 0; s < rec->n_sample; ++s) {
        const char *p = line.c_str() + cols[9 + s].first;
        const char *end = p + cols[9 + s].second;
        int k = 0;
        bool phased = false;  // first allele never carries the phase bit
        while (p < end && *p != ':' && k < max_ploidy) {
            int allele;
            if (*p == '.') {
                allele = -1;
                ++p;
            } else {
                char *q;
                allele = (int)strtol(p, &q, 10);
                if (q == p) {
                    rec->errcode = 1;
                    return -1;
                }
                p = q;
            }
            ri->gt[(size_t)s * max_ploidy + k] =
                (uint8_t)(((allele + 1) << 1) | (phased ? 1 : 0));
            ++k;
            if (p < end && (*p == '/' || *p == '|')) {
                phased = (*p == '|');
                ++p;
            }
        }
        for (; k < max_ploidy; ++k)
            ri->gt[(size_t)s * max_ploidy + k] = 0x81;  // int8 vector-end
    }

    ri->fmt[0].id = shared_dict_id(himpl, first_key);
    ri->fmt[0].n = max_ploidy;
    ri->fmt[0].size = max_ploidy;  // int8 elements
    ri->fmt[0].type = 0;
    ri->fmt[0].p = ri->gt.data();
    ri->fmt[0].p_len = (int)ri->gt.size();
    rec->d.fmt = ri->fmt;
    rec->n_fmt = n_keys;
    return 0;
}

}  // extern "C"
