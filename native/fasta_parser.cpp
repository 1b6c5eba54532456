// Native FASTA/FASTQ parser (reference: the kseq++-based parser in
// common/io/src/fasta_parser_kseqpp.cpp [U]).  A from-scratch kseq-style
// streaming state machine over zlib (gzopen reads plain files transparently),
// exposed through a C ABI consumed by ctypes (io/native_fasta.py).
//
// Build: native/build.sh  ->  claragenomicsanalysis_tpu/io/_native/libfasta.so

#include <zlib.h>

#include <cstring>
#include <memory>
#include <string>
#include <vector>

namespace {

struct Record {
    std::string name;
    std::string seq;
};

struct Parser {
    std::vector<Record> records;
    std::string error;
};

class GzReader {
  public:
    explicit GzReader(const char* path) : f_(gzopen(path, "rb")) {}
    ~GzReader() {
        if (f_) gzclose(f_);
    }
    bool ok() const { return f_ != nullptr; }

    // Returns false on EOF with no data.  Strips \r\n.
    bool getline(std::string* out) {
        out->clear();
        while (true) {
            if (pos_ >= len_) {
                len_ = gzread(f_, buf_, sizeof(buf_));
                pos_ = 0;
                if (len_ <= 0) return !out->empty();
            }
            char* nl = static_cast<char*>(
                memchr(buf_ + pos_, '\n', len_ - pos_));
            if (nl) {
                out->append(buf_ + pos_, nl - (buf_ + pos_));
                pos_ = (nl - buf_) + 1;
                if (!out->empty() && out->back() == '\r') out->pop_back();
                return true;
            }
            out->append(buf_ + pos_, len_ - pos_);
            pos_ = len_;
        }
    }

  private:
    gzFile f_;
    char buf_[1 << 16];
    int len_ = 0;
    int pos_ = 0;
};

std::string first_token(const std::string& header) {
    size_t start = 1;  // skip '>' or '@'
    size_t end = header.find_first_of(" \t", start);
    if (end == std::string::npos) end = header.size();
    return header.substr(start, end - start);
}

bool parse_stream(GzReader* in, Parser* p) {
    std::string line;
    if (!in->getline(&line)) return true;  // empty file: zero records
    while (true) {
        if (line.empty()) {
            if (!in->getline(&line)) return true;
            continue;
        }
        if (line[0] == '>') {  // FASTA record: seq may span lines
            Record rec;
            rec.name = first_token(line);
            bool more = false;
            while ((more = in->getline(&line))) {
                if (!line.empty() && (line[0] == '>' || line[0] == '@')) break;
                rec.seq += line;
            }
            p->records.push_back(std::move(rec));
            if (!more) return true;
        } else if (line[0] == '@') {  // FASTQ record: fixed 4 lines
            Record rec;
            rec.name = first_token(line);
            if (!in->getline(&rec.seq)) {
                p->error = "truncated FASTQ record (missing sequence)";
                return false;
            }
            if (!in->getline(&line) || line.empty() || line[0] != '+') {
                p->error = "malformed FASTQ separator";
                return false;
            }
            if (!in->getline(&line)) {
                p->error = "truncated FASTQ record (missing quality)";
                return false;
            }
            p->records.push_back(std::move(rec));
            if (!in->getline(&line)) return true;
        } else {
            p->error = "not FASTA/FASTQ: unexpected line start '" +
                       line.substr(0, 1) + "'";
            return false;
        }
    }
}

}  // namespace

extern "C" {

void* cga_fasta_open(const char* path) {
    auto p = std::make_unique<Parser>();
    GzReader in(path);
    if (!in.ok()) {
        p->error = "cannot open file";
        return p.release();  // caller reads error then closes
    }
    parse_stream(&in, p.get());
    return p.release();
}

long cga_fasta_num_records(void* h) {
    return static_cast<Parser*>(h)->records.size();
}

const char* cga_fasta_name(void* h, long i) {
    return static_cast<Parser*>(h)->records[i].name.c_str();
}

const char* cga_fasta_seq(void* h, long i) {
    return static_cast<Parser*>(h)->records[i].seq.c_str();
}

long cga_fasta_seq_len(void* h, long i) {
    return static_cast<Parser*>(h)->records[i].seq.size();
}

const char* cga_fasta_error(void* h) {
    return static_cast<Parser*>(h)->error.c_str();
}

void cga_fasta_close(void* h) {
    delete static_cast<Parser*>(h);
}

}  // extern "C"
