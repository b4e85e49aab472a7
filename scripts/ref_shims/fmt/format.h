// Minimal fmt shim for compiling reference headers in golden drivers:
// sequential "{}" substitution via ostringstream (only the subset the
// reference headers use).
#pragma once
#include <sstream>
#include <string>

namespace fmt {

inline void _fmt_one(std::ostringstream&) {}

template <typename T, typename... Rest>
void _fmt_rec(std::ostringstream& os, const std::string& f, size_t pos,
              const T& v, Rest&&... rest);

inline void _fmt_rec(std::ostringstream& os, const std::string& f,
                     size_t pos) {
  os << f.substr(pos);
}

template <typename T, typename... Rest>
void _fmt_rec(std::ostringstream& os, const std::string& f, size_t pos,
              const T& v, Rest&&... rest) {
  size_t b = f.find("{}", pos);
  if (b == std::string::npos) { os << f.substr(pos); return; }
  os << f.substr(pos, b - pos) << v;
  _fmt_rec(os, f, b + 2, std::forward<Rest>(rest)...);
}

template <typename... Args>
std::string format(const std::string& f, Args&&... args) {
  std::ostringstream os;
  _fmt_rec(os, f, 0, std::forward<Args>(args)...);
  return os.str();
}

}  // namespace fmt
