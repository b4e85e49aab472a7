// Minimal bc::utils shim (join/trim/split/lexical_cast) for compiling the
// reference's fof.hpp in golden drivers.
#pragma once
#include <sstream>
#include <string>
#include <vector>

namespace bc { namespace utils {

inline std::string trim(std::string s) {
  const char* ws = " \t\r\n";
  size_t b = s.find_first_not_of(ws);
  if (b == std::string::npos) return "";
  size_t e = s.find_last_not_of(ws);
  return s.substr(b, e - b + 1);
}

inline std::vector<std::string> split(const std::string& s, char d) {
  std::vector<std::string> out;
  std::string cur;
  std::istringstream iss(s);
  while (std::getline(iss, cur, d)) out.push_back(cur);
  return out;
}

inline std::string join(const std::vector<std::string>& v,
                        const std::string& d) {
  std::ostringstream os;
  for (size_t i = 0; i < v.size(); i++) {
    if (i) os << d;
    os << v[i];
  }
  return os.str();
}

template <typename T>
T lexical_cast(const std::string& s) {
  std::istringstream iss(s);
  T v{};
  iss >> v;
  return v;
}

}}  // namespace bc::utils
