// Minimal no-dependency glog shim so the reference pbrt-v3 binary can be
// built for golden-image generation (the real glog submodule is absent in
// this mount).  Implements only the surface pbrt-v3 uses:
//   LOG(INFO|WARNING|ERROR|FATAL) streams, VLOG(n), CHECK/CHECK_EQ/... ,
//   DCHECK variants, google::InitGoogleLogging, and the FLAGS_* globals
//   touched by src/main/pbrt.cpp:77-132.
// Messages below the minloglevel threshold are swallowed; FATAL aborts.
#ifndef PBRT_SHIM_GLOG_LOGGING_H
#define PBRT_SHIM_GLOG_LOGGING_H

#include <cstdlib>
#include <iostream>
#include <sstream>
#include <string>

namespace google {
inline void InitGoogleLogging(const char *) {}
inline void ShutdownGoogleLogging() {}
}  // namespace google

// Flag globals (defined in one TU via PBRT_SHIM_GLOG_IMPL, declared here).
extern int FLAGS_stderrthreshold;
extern int FLAGS_minloglevel;
extern int FLAGS_v;
extern bool FLAGS_logtostderr;
extern std::string FLAGS_log_dir;

#ifdef PBRT_SHIM_GLOG_IMPL
int FLAGS_stderrthreshold = 1;
int FLAGS_minloglevel = 0;
int FLAGS_v = 0;
bool FLAGS_logtostderr = false;
std::string FLAGS_log_dir;
#endif

namespace pbrt_glog_shim {

enum Severity { INFO = 0, WARNING = 1, ERROR = 2, FATAL = 3 };

class LogMessage {
  public:
    LogMessage(int severity, bool enabled)
        : severity_(severity), enabled_(enabled) {}
    ~LogMessage() {
        if (enabled_ && severity_ >= FLAGS_minloglevel &&
            (severity_ >= FLAGS_stderrthreshold || FLAGS_logtostderr)) {
            static const char *names[] = {"I", "W", "E", "F"};
            std::cerr << names[severity_] << " " << stream_.str() << std::endl;
        }
        if (severity_ == FATAL && enabled_) std::abort();
    }
    std::ostream &stream() { return stream_; }

  private:
    int severity_;
    bool enabled_;
    std::ostringstream stream_;
};

// Voidify swallows the stream expression when disabled (mirrors glog).
struct Voidify {
    void operator&(std::ostream &) {}
};

}  // namespace pbrt_glog_shim

#define PBRT_SHIM_LOG_SEV_INFO pbrt_glog_shim::INFO
#define PBRT_SHIM_LOG_SEV_WARNING pbrt_glog_shim::WARNING
#define PBRT_SHIM_LOG_SEV_ERROR pbrt_glog_shim::ERROR
#define PBRT_SHIM_LOG_SEV_FATAL pbrt_glog_shim::FATAL

#define LOG(severity) \
    pbrt_glog_shim::LogMessage(PBRT_SHIM_LOG_SEV_##severity, true).stream()
#define LOG_IF(severity, cond) \
    pbrt_glog_shim::LogMessage(PBRT_SHIM_LOG_SEV_##severity, (cond)).stream()
#define VLOG(n) \
    pbrt_glog_shim::LogMessage(pbrt_glog_shim::INFO, FLAGS_v >= (n)).stream()
#define VLOG_IS_ON(n) (FLAGS_v >= (n))

#define CHECK(cond)                                                     \
    pbrt_glog_shim::LogMessage(pbrt_glog_shim::FATAL, !(cond)).stream() \
        << "Check failed: " #cond " "
#define CHECK_OP(a, b, op)                                                   \
    pbrt_glog_shim::LogMessage(pbrt_glog_shim::FATAL, !((a)op(b))).stream() \
        << "Check failed: " #a " " #op " " #b " "
#define CHECK_EQ(a, b) CHECK_OP(a, b, ==)
#define CHECK_NE(a, b) CHECK_OP(a, b, !=)
#define CHECK_LT(a, b) CHECK_OP(a, b, <)
#define CHECK_LE(a, b) CHECK_OP(a, b, <=)
#define CHECK_GT(a, b) CHECK_OP(a, b, >)
#define CHECK_GE(a, b) CHECK_OP(a, b, >=)
#define CHECK_NOTNULL(p) (p)

#ifdef NDEBUG
#define DCHECK(cond) \
    true ? (void)0 : pbrt_glog_shim::Voidify() & LOG(INFO)
#define DCHECK_EQ(a, b) DCHECK((a) == (b))
#define DCHECK_NE(a, b) DCHECK((a) != (b))
#define DCHECK_LT(a, b) DCHECK((a) < (b))
#define DCHECK_LE(a, b) DCHECK((a) <= (b))
#define DCHECK_GT(a, b) DCHECK((a) > (b))
#define DCHECK_GE(a, b) DCHECK((a) >= (b))
#else
#define DCHECK(cond) CHECK(cond)
#define DCHECK_EQ(a, b) CHECK_EQ(a, b)
#define DCHECK_NE(a, b) CHECK_NE(a, b)
#define DCHECK_LT(a, b) CHECK_LT(a, b)
#define DCHECK_LE(a, b) CHECK_LE(a, b)
#define DCHECK_GT(a, b) CHECK_GT(a, b)
#define DCHECK_GE(a, b) CHECK_GE(a, b)
#endif

#endif  // PBRT_SHIM_GLOG_LOGGING_H
