// No-op spdlog shim for golden drivers (the reference headers only log).
#pragma once
#include <string>
namespace spdlog {
template <typename... Args> inline void trace(Args&&...) {}
template <typename... Args> inline void debug(Args&&...) {}
template <typename... Args> inline void info(Args&&...) {}
template <typename... Args> inline void warn(Args&&...) {}
template <typename... Args> inline void error(Args&&...) {}
template <typename... Args> inline void critical(Args&&...) {}
}  // namespace spdlog
