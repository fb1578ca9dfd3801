// Minimal spdlog stand-in for building the reference C++ core without
// its (empty, un-checked-out) vendored submodule.  Logging is a no-op.
#pragma once
#include <memory>
#include <string>
#include <cstring>
namespace spdlog {
class logger {
 public:
    template <typename... A> void info(A&&...) {}
    template <typename... A> void debug(A&&...) {}
    template <typename... A> void warn(A&&...) {}
    template <typename... A> void trace(A&&...) {}
    template <typename... A> void critical(A&&...) {}
};
namespace level {
enum level_enum { off, warn, info, debug, trace };
}
inline std::shared_ptr<logger>& default_logger() {
    static std::shared_ptr<logger> l = std::make_shared<logger>();
    return l;
}
inline void set_pattern(const std::string&) {}
inline void set_level(level::level_enum) {}
}  // namespace spdlog
